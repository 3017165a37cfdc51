"""Fast per-mode end-to-end net (the `make test-fast` core).

The full suite is compile-bound (~54 min not-slow on the 1-core CI box,
r4 measurement), so the heavy integration files carry a file-level
`slow` mark and this module keeps one tiny end-to-end check per product
engine mode — shared+grid (headline), lmac+grid2 (accuracy), the u/o
API duality, and the overflow contract — against the fp64 direct-sum
oracle. One dataset, minimal distinct TreeConfigs, so the whole module
costs a handful of XLA compiles.

Reference parity: rakau's test_accs_pots acceptance style (per-theta
relative-error envelopes vs exact summation), SURVEY.md §5.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rakau_tpu import build, engine, particles
from rakau_tpu.config import TreeConfig
from rakau_tpu.direct import direct_acc_pot_np

N = 2048
_STATE = {}


def _data():
    if "pos" not in _STATE:
        pos, mass = particles.plummer(jax.random.PRNGKey(11), N)
        _STATE["pos"], _STATE["mass"] = pos, mass
        acc, pot = direct_acc_pot_np(np.asarray(pos, np.float64),
                                     np.asarray(mass, np.float64))
        _STATE["acc_o"], _STATE["pot_o"] = acc, pot
    return (_STATE["pos"], _STATE["mass"], _STATE["acc_o"],
            _STATE["pot_o"])


def _rms(acc, acc_o):
    num = np.linalg.norm(np.asarray(acc, np.float64) - acc_o, axis=1)
    den = np.maximum(np.linalg.norm(acc_o, axis=1), 1e-300)
    return float(np.sqrt(np.mean((num / den) ** 2)))


def _base(**kw):
    d = dict(max_depth=10, max_leaf_n=16, ncrit=64, tile_chunk=8,
             m2p_cap=4096, p2p_leaf_cap=1024, p2p_src_cap=8192,
             frontier_cap=4096)
    d.update(kw)
    return TreeConfig(**d)


def test_shared_grid_query_vs_oracle():
    pos, mass, acc_o, pot_o = _data()
    cfg = _base(farfield="grid", grid_level=3)
    td = build.build_tree(pos, mass, cfg)
    assert not bool(td.overflow)
    acc, pot, ovf, _ = engine.acc_pot_u_host(td, cfg, jnp.float32(0.75),
                                             jnp.float32(0.0), 1.0)
    assert not bool(np.asarray(ovf).any())
    # map back to user order via the build permutation
    inv = np.asarray(td.inv_perm)
    rms = _rms(np.asarray(acc)[inv], acc_o)
    assert rms < 8e-3, f"shared+grid theta=0.75 rms {rms:.2e}"
    prms = _rms(np.asarray(pot)[inv][:, None], pot_o[:, None])
    assert prms < 4e-3, f"pot rms {prms:.2e}"


def test_lmac_grid2_query_vs_oracle():
    pos, mass, acc_o, _ = _data()
    cfg = _base(traversal_mode="lmac", farfield="grid2", local_order=4,
                grid_sep=2, grid_level=3, frontier_cap=16384)
    td = build.build_tree(pos, mass, cfg)
    acc, pot, ovf, _ = engine.acc_pot_u_host(td, cfg, jnp.float32(0.75),
                                             jnp.float32(0.0), 1.0)
    assert not bool(np.asarray(ovf).any())
    inv = np.asarray(td.inv_perm)
    rms = _rms(np.asarray(acc)[inv], acc_o)
    assert rms < 8e-3, f"lmac+grid2 rms {rms:.2e}"


def test_gwalk_grid2_quad_query_vs_oracle():
    """The r5 headline candidate: gwalk traversal + grid2 conv-M2L far
    field + quadrupole M2P through the pool kernel path."""
    pos, mass, acc_o, _ = _data()
    cfg = _base(traversal_mode="gwalk", farfield="grid2", local_order=4,
                grid_sep=2, grid_level=3, multipole_order=2,
                m2p_cap=131072, p2p_leaf_cap=65536, p2p_src_cap=1048576,
                pool_window=65536, pool_block=128)
    td = build.build_tree(pos, mass, cfg)
    assert not bool(td.overflow)
    acc, pot, ovf, _ = engine.acc_pot_u_host(td, cfg, jnp.float32(0.75),
                                             jnp.float32(0.0), 1.0)
    assert not bool(np.asarray(ovf).any())
    inv = np.asarray(td.inv_perm)
    rms = _rms(np.asarray(acc)[inv], acc_o)
    assert rms < 5e-3, f"gwalk+grid2+quad rms {rms:.2e}"


def test_tree_api_uo_duality_and_update():
    from rakau_tpu.tree import Tree
    pos, mass, acc_o, _ = _data()
    cfg = _base(farfield="grid", grid_level=3)
    t = Tree(coords=np.asarray(pos), masses=np.asarray(mass), config=cfg)
    acc_o_view, pot_o_view = t.accs_pots_o(0.75)
    acc_u, pot_u = t.accs_pots_u(0.75)
    perm = np.asarray(t.perm)   # Morton slot -> user index
    np.testing.assert_allclose(np.asarray(acc_u),
                               np.asarray(acc_o_view)[perm], rtol=0,
                               atol=0)
    rms = _rms(np.asarray(acc_o_view), acc_o)
    assert rms < 8e-3
    # positions update keeps physics consistent with a fresh build
    p2 = np.asarray(pos) * 1.0
    p2[:64] += 0.01
    t.update_positions_o(p2)
    a2, _ = t.accs_pots_o(0.75)
    t2 = Tree(coords=p2, masses=np.asarray(mass), config=cfg)
    a2f, _ = t2.accs_pots_o(0.75)
    dev = np.max(np.linalg.norm(np.asarray(a2) - np.asarray(a2f),
                                axis=1))
    scale = np.max(np.linalg.norm(np.asarray(a2f), axis=1))
    assert dev / scale < 2e-5, f"update vs rebuild dev {dev/scale:.2e}"


def test_overflow_flags_raise_not_truncate():
    pos, mass, _, _ = _data()
    cfg = _base(p2p_src_cap=128, m2p_cap=128, p2p_leaf_cap=64)
    td = build.build_tree(pos, mass, cfg)
    acc, pot, ovf, mx = engine.acc_pot_u_host(
        td, cfg, jnp.float32(0.3), jnp.float32(0.0), 1.0)
    assert bool(np.asarray(ovf).any()), \
        "tiny caps at theta=0.3 must overflow, never truncate silently"
