"""Product-mode validation must be LIVE in tests (VERDICT r4 weak #2).

The r4 MULTICHIP artifact went red because (a) an internal path
(parallel/let.py _export_cfg) constructed a config the product-mode
matrix rejects, and (b) the whole suite ran under RAKAU_DIAG_MODES=1 so
no test could catch it. These tests run with the variable explicitly
ABSENT and assert both directions: the matrix raises on diagnostic
combos, and every product entry point (engine configs, the LET internal
export/query configs, the dryrun_multichip configs) constructs cleanly.
"""
import pytest

from rakau_tpu.config import TreeConfig
from rakau_tpu.parallel import let


@pytest.fixture(autouse=True)
def _product_env(monkeypatch):
    monkeypatch.delenv("RAKAU_DIAG_MODES", raising=False)


def test_lists_mode_raises():
    with pytest.raises(ValueError, match="diagnostic-only"):
        TreeConfig(traversal_mode="lists")


def test_quad_with_tile_expansion_farfields_raises():
    for ff in ("local", "grid"):
        with pytest.raises(ValueError, match="multipole_order=2"):
            TreeConfig(multipole_order=2, farfield=ff)


def test_diag_env_unlocks(monkeypatch):
    monkeypatch.setenv("RAKAU_DIAG_MODES", "1")
    TreeConfig(traversal_mode="lists")
    TreeConfig(multipole_order=2, farfield="local")


@pytest.mark.parametrize("cfg_kw", [
    dict(),                                            # headline default
    dict(farfield="grid"),
    dict(farfield="m2p", multipole_order=2),
    dict(traversal_mode="lmac", farfield="grid2", multipole_order=2),
    dict(traversal_mode="lmac", farfield="grid2", multipole_order=2,
         local_order=6, accum="compensated"),          # accuracy ladder
])
def test_let_internal_cfgs_construct(cfg_kw):
    """Every internal config the LET path derives from a product config
    must itself be a product config (the r4 regression class)."""
    cfg = TreeConfig(**cfg_kw)
    let._export_cfg(cfg, 512, 2048, 256, 512)
    let._query_cfg(cfg)


def test_dryrun_cfg_constructions():
    """The exact configs __graft_entry__.dryrun_multichip builds (not the
    mesh run itself — that is the driver's job) must construct and derive
    their LET internals cleanly in a product environment."""
    import __graft_entry__ as ge

    ge._flagship_cfg()
    cfg = TreeConfig(max_depth=6, max_leaf_n=16, ncrit=32, tile_chunk=8,
                     m2p_cap=512, p2p_leaf_cap=256, p2p_src_cap=2048,
                     frontier_cap=512)
    cfg2 = cfg.with_(traversal_mode="lmac", farfield="m2p",
                     multipole_order=2, frontier_cap=4096)
    for c in (cfg, cfg2):
        let._export_cfg(c, 8192, 32768, 4096, 1024)
        let._query_cfg(c)


def test_query_cfg_mapping():
    assert let._query_cfg(TreeConfig(farfield="grid")).farfield == "local"
    q = let._query_cfg(TreeConfig(traversal_mode="lmac", farfield="grid2",
                                  multipole_order=2))
    assert q.farfield == "m2p" and q.multipole_order == 2
    e = let._export_cfg(TreeConfig(farfield="m2p", multipole_order=2),
                        512, 2048, 256, 512)
    assert e.multipole_order == 0 and e.farfield == "local"
