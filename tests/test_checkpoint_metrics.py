import os

import numpy as np
import jax

from rakau_tpu import Tree, checkpoint, metrics, particles, build
from rakau_tpu.config import TreeConfig


CFG = dict(max_depth=8, max_leaf_n=16, ncrit=64, tile_chunk=16)



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


def test_checkpoint_roundtrip(tmp_path):
    pos, mass = particles.plummer(jax.random.PRNGKey(41), 1024)
    t = Tree(coords=np.asarray(pos), masses=np.asarray(mass), **CFG)
    p = os.path.join(tmp_path, "tree.npz")
    checkpoint.save_tree(p, t)
    t2 = checkpoint.load_tree(p)
    np.testing.assert_array_equal(np.asarray(t2.positions_o),
                                  np.asarray(t.positions_o))
    a1 = np.asarray(t.accs_o(theta=0.5))
    a2 = np.asarray(t2.accs_o(theta=0.5))
    np.testing.assert_allclose(a1, a2, atol=1e-7)


def test_state_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "state.npz")
    pos = np.random.default_rng(0).standard_normal((100, 3))
    checkpoint.save_state(p, pos, pos * 0, np.ones(100), step=7)
    st = checkpoint.load_state(p)
    np.testing.assert_array_equal(st["positions"], pos)
    assert int(st["step"]) == 7


def test_query_stats_and_fitted_caps(diag_modes):
    pos, mass = particles.plummer(jax.random.PRNGKey(43), 2048)
    cfg = TreeConfig(**CFG)
    td = build.build_tree(pos, mass, cfg)
    st = metrics.collect_query_stats(td, cfg, 0.5)
    assert st.n == 2048 and st.n_tiles > 0
    assert 0 < st.tile_fill <= 1.0
    assert st.m2p_max <= cfg.m2p_cap and st.p2p_max <= cfg.p2p_src_cap
    assert st.interactions_m2p > 0 and st.interactions_p2p > 0
    caps = metrics.fitted_caps(st)
    assert caps["m2p_cap"] >= st.m2p_max
    assert caps["p2p_src_cap"] >= st.p2p_max
    # fitted caps shouldn't overflow: rerun traversal with them (caps
    # from list statistics apply to the list traversal mode)
    cfg2 = cfg.with_(traversal_mode="lists", **caps)
    td2 = build.build_tree(pos, mass, cfg2)
    from rakau_tpu import engine
    import jax.numpy as jnp
    _, _, ovf = engine.acc_pot_u(td2, cfg2, 0.5, 0.0)
    assert not bool(np.asarray(ovf).any())
