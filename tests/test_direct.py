import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import direct, particles
from .helpers import rel_vec_err


@pytest.mark.parametrize("eps", [0.0, 0.01])
@pytest.mark.parametrize("ndim", [2, 3])
def test_direct_matches_numpy_oracle(eps, ndim, rng):
    n = 500
    pos = rng.standard_normal((n, ndim)).astype(np.float32)
    mass = rng.uniform(0.1, 1.0, n).astype(np.float32)
    acc, pot = direct.direct_acc_pot(jnp.asarray(pos), jnp.asarray(mass),
                                     eps=eps, G=1.0, chunk=128)
    acc_o, pot_o = direct.direct_acc_pot_np(pos, mass, eps=eps, G=1.0)
    # fp32 vs fp64 oracle: vector-norm relative error (close pairs amplify
    # per-component relative error through cancellation).
    assert rel_vec_err(acc, acc_o).max() < 5e-5
    np.testing.assert_allclose(np.asarray(pot), pot_o, rtol=5e-5)


def test_direct_fp64_tight(rng):
    n = 200
    pos = rng.standard_normal((n, 3))
    mass = rng.uniform(0.1, 1.0, n)
    acc, pot = direct.direct_acc_pot(jnp.asarray(pos, jnp.float64),
                                     jnp.asarray(mass, jnp.float64),
                                     eps=0.05, chunk=64)
    acc_o, pot_o = direct.direct_acc_pot_np(pos, mass, eps=0.05)
    np.testing.assert_allclose(np.asarray(acc), acc_o, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(pot), pot_o, rtol=1e-11)


def test_two_body_analytic():
    # Two unit masses at distance 2: |acc| = 1/4 toward each other,
    # pot = -1/2 each (G=1, eps=0).
    pos = jnp.asarray([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    mass = jnp.ones(2, jnp.float32)
    acc, pot = direct.direct_acc_pot(pos, mass, chunk=2)
    np.testing.assert_allclose(np.asarray(acc),
                               [[0.25, 0, 0], [-0.25, 0, 0]], atol=1e-7)
    np.testing.assert_allclose(np.asarray(pot), [-0.5, -0.5], atol=1e-7)


def test_momentum_conservation(rng):
    # Newton's third law: sum_i m_i a_i = 0.
    n = 300
    pos = rng.standard_normal((n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    acc, _ = direct.direct_acc_pot(jnp.asarray(pos), jnp.asarray(mass),
                                   eps=0.01, chunk=100)
    total = np.asarray(acc * np.asarray(mass)[:, None]).sum(axis=0)
    assert np.abs(total).max() < 1e-3


def test_softening_monotone():
    pos = jnp.asarray([[0.0, 0, 0], [0.1, 0, 0]], jnp.float32)
    mass = jnp.ones(2, jnp.float32)
    a0, _ = direct.direct_acc_pot(pos, mass, eps=0.0, chunk=2)
    a1, _ = direct.direct_acc_pot(pos, mass, eps=0.5, chunk=2)
    assert np.abs(np.asarray(a1)).max() < np.abs(np.asarray(a0)).max()


def test_coincident_particles_softened():
    pos = jnp.zeros((3, 3), jnp.float32)
    mass = jnp.ones(3, jnp.float32)
    acc, pot = direct.direct_acc_pot(pos, mass, eps=0.1, chunk=3)
    assert np.all(np.isfinite(np.asarray(acc)))
    np.testing.assert_allclose(np.asarray(pot), -2 / 0.1 * np.ones(3),
                               rtol=1e-5)


def test_generators_inside_box():
    key = jax.random.PRNGKey(0)
    for gen in (particles.plummer, particles.cold_sphere):
        pos, mass = gen(key, 1000)
        box = particles.auto_box_size(pos)
        particles.raise_on_invalid(pos, mass, box)
    pos, mass = particles.uniform_cube(key, 1000)
    particles.raise_on_invalid(pos, mass, jnp.asarray(1.0))


def test_validation_raises():
    mass = jnp.ones(2, jnp.float32)
    with pytest.raises(ValueError, match="non-finite coordinate"):
        particles.raise_on_invalid(
            jnp.asarray([[0.0, 0, 0], [jnp.nan, 0, 0]]), mass, 1.0)
    with pytest.raises(ValueError, match="outside"):
        particles.raise_on_invalid(
            jnp.asarray([[0.0, 0, 0], [3.0, 0, 0]]), mass, 1.0)
    with pytest.raises(ValueError, match="same length"):
        particles.raise_on_invalid(jnp.zeros((3, 3)), mass, 1.0)
