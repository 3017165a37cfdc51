"""Parameter-matrix sweep: ndim x dtype x MAC x traversal vs the fp64
oracle (VERDICT r1 test-strategy gap: "no fp64x2D or mac x dtype sweep").

Mirrors the reference's templated test instantiation (SURVEY.md §5:
NDim in {2,3} x F in {float,double} x MAC in {bh, bh_geom}); the
traversal mode alternates so both shared-candidate and lmac cover every
(ndim, dtype, mac) cell across the matrix. At theta=0.5 the error is
MAC-truncation-dominated (monopole far field), so fp32 and fp64 share
an envelope class (measured: 3D ~5e-4..1.5e-3, 2D ~6e-3..8e-3 at 2048
Plummer); dtype-limited accuracy is pinned separately by the theta->0
exactness and fp64 tests in test_engine.py. The sweep's job is that
every (ndim, dtype, mac, traversal) cell runs the full pipeline and
lands inside its measured envelope.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, engine, particles
from rakau_tpu.config import TreeConfig
from rakau_tpu.direct import direct_acc_pot_np
from .helpers import rel_vec_err, rms


MATRIX = [
    # ndim, dtype,   mac,      traversal, theta, rms_bound
    (3, "float32", "bh",      "shared", 0.5, 3e-3),
    (3, "float32", "bh_geom", "lmac",   0.5, 3e-3),
    (3, "float64", "bh",      "lmac",   0.5, 1e-3),
    (3, "float64", "bh_geom", "shared", 0.5, 1e-3),
    (2, "float32", "bh",      "lmac",   0.5, 1.2e-2),
    (2, "float32", "bh_geom", "shared", 0.5, 1.2e-2),
    (2, "float64", "bh",      "shared", 0.5, 1.2e-2),
    (2, "float64", "bh_geom", "lmac",   0.5, 1.2e-2),
]



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("ndim,dtype,mac,mode,theta,bound", MATRIX)
def test_param_matrix(ndim, dtype, mac, mode, theta, bound):
    n = 2048
    pos, mass = particles.plummer(jax.random.PRNGKey(7), n, ndim=ndim)
    pos = jnp.asarray(pos, dtype)
    mass = jnp.asarray(mass, dtype)
    cfg = TreeConfig(ndim=ndim, dtype=dtype, mac=mac, traversal_mode=mode,
                     max_depth=8, max_leaf_n=16, ncrit=64, tile_chunk=16,
                     m2p_cap=2048, p2p_src_cap=16384, p2p_leaf_cap=1024,
                     frontier_cap=1024, kernel_backend="xla")
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    assert not bool(td.overflow)
    acc, pot, ovf = engine.acc_pot_u(
        td, cfg, jnp.asarray(theta, cfg.jdtype),
        jnp.asarray(0.0, cfg.jdtype), jnp.asarray(1.0, cfg.jdtype))
    assert not bool(np.asarray(ovf).any())
    acc_o, pot_o = direct_acc_pot_np(np.asarray(td.pos, np.float64),
                                     np.asarray(td.mass, np.float64))
    err = rms(rel_vec_err(np.asarray(acc, np.float64), acc_o))
    assert np.isfinite(np.asarray(acc)).all()
    assert err < bound, (ndim, dtype, mac, mode, err)
    # potential error rides the same envelope class
    perr = rms(np.abs(np.asarray(pot, np.float64) - pot_o)
               / np.maximum(np.abs(pot_o), 1e-300))
    assert perr < bound, (ndim, dtype, mac, mode, perr)
