"""Leapfrog (kick-drift-kick) integration harness.

The reference ships no integrator as a library feature — its benchmarks/
examples run the time-stepping loop calling `update_positions_u` + re-query
per step (SURVEY.md §1, §4.3). This module provides the same loop as a
jittable step function (tree rebuild every step, matching BASELINE configs
#2-#3), plus energy diagnostics for drift checks.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import build as _build
from . import engine as _engine
from .config import TreeConfig


class NBodyState(NamedTuple):
    pos: jnp.ndarray    # [N, D] (any consistent order)
    vel: jnp.ndarray    # [N, D]
    mass: jnp.ndarray   # [N]


def acc_pot(pos, mass, cfg: TreeConfig, theta, eps, G=1.0, box_size=None):
    """Build + query in one jittable call (per-step rebuild pattern).

    Returns acc/pot in the *input* order (internally sorts and scatters
    back), plus the overflow flags."""
    td = _build.build_tree(pos, mass, cfg, box_size=box_size)
    acc_u, pot_u, ovf = _engine.acc_pot_u(td, cfg, theta, eps, G)
    inv = td.inv_perm
    return acc_u[inv], pot_u[inv], ovf


@partial(jax.jit, static_argnames=("cfg",))
def leapfrog_step(state: NBodyState, dt, cfg: TreeConfig, theta, eps,
                  G=1.0, box_size=None):
    """One KDK leapfrog step with per-step tree rebuild (BASELINE config
    #2). Returns (new_state, overflow_flags)."""
    acc0, _, ovf0 = acc_pot(state.pos, state.mass, cfg, theta, eps, G,
                            box_size)
    vel_h = state.vel + 0.5 * dt * acc0
    pos1 = state.pos + dt * vel_h
    acc1, _, ovf1 = acc_pot(pos1, state.mass, cfg, theta, eps, G, box_size)
    vel1 = vel_h + 0.5 * dt * acc1
    return NBodyState(pos1, vel1, state.mass), ovf0 | ovf1


@partial(jax.jit, static_argnames=("cfg",))
def leapfrog_step_morton(state: NBodyState, dt, cfg: TreeConfig, theta,
                         eps, G=1.0, box_size=None):
    """KDK leapfrog step that KEEPS the state in Morton order across
    steps (SURVEY C11 / BASELINE config #3 pattern): rebuild inputs are
    the previous step's Morton order, which makes gathers local even
    though the re-sort is FULL — the near-sorted blockwise re-sort was
    measured refuted at device scale and deleted (build.sort_by_code).
    Returns (new_state_in_new_Morton_order, ovf, step_perm) where
    step_perm maps new-order slots to the INPUT order of `state`
    (compose across steps to recover the original order)."""
    td0 = _build.build_tree(state.pos, state.mass, cfg,
                            box_size=box_size)
    acc0, _, ovf0 = _engine.acc_pot_u(td0, cfg, theta, eps, G)
    vel_h = state.vel[td0.perm] + 0.5 * dt * acc0
    pos1 = td0.pos + dt * vel_h
    td1 = _build.build_tree(pos1, td0.mass, cfg, box_size=box_size)
    acc1, _, ovf1 = _engine.acc_pot_u(td1, cfg, theta, eps, G)
    vel1 = vel_h[td1.perm] + 0.5 * dt * acc1
    step_perm = td0.perm[td1.perm]
    return NBodyState(td1.pos, vel1, td1.mass), ovf0 | ovf1, step_perm


@partial(jax.jit, static_argnames=("cfg",))
def total_energy(state: NBodyState, cfg: TreeConfig, theta, eps, G=1.0,
                 box_size=None):
    """Kinetic + potential energy (E_pot = 0.5 sum m_i phi_i); tree-based
    potentials (pass theta ~ 0 + direct for exact)."""
    _, pot, _ = acc_pot(state.pos, state.mass, cfg, theta, eps, G, box_size)
    ke = 0.5 * jnp.sum(state.mass * jnp.sum(state.vel ** 2, axis=1))
    pe = 0.5 * jnp.sum(state.mass * pot)
    return ke + pe


_build_jit = None


def acc_pot_host(pos, mass, cfg: TreeConfig, theta, eps, G=1.0,
                 box_size=None, slice_chunks: int = 32):
    """Host-driven build + query for large N (each device dispatch stays
    under the TPU runtime's hang watchdog; see engine.acc_pot_u_host).
    Results in input order."""
    global _build_jit
    if _build_jit is None:
        _build_jit = jax.jit(_build.build_tree, static_argnames=("cfg",))
    td = _build_jit(pos, mass, cfg,
                    None if box_size is None
                    else jnp.asarray(box_size, pos.dtype))
    acc_u, pot_u, ovf, mx = _engine.acc_pot_u_host(
        td, cfg, theta, eps, G, slice_chunks=slice_chunks)
    inv = td.inv_perm
    return acc_u[inv], pot_u[inv], ovf


def leapfrog_step_host(state: NBodyState, dt, cfg: TreeConfig, theta,
                       eps, G=1.0, box_size=None, slice_chunks: int = 32):
    """KDK leapfrog step with per-step rebuild, host-sliced dispatches
    (for particle counts where one fused step executable would exceed
    the TPU watchdog)."""
    acc0, _, ovf0 = acc_pot_host(state.pos, state.mass, cfg, theta, eps,
                                 G, box_size, slice_chunks)
    vel_h = state.vel + 0.5 * dt * acc0
    pos1 = state.pos + dt * vel_h
    acc1, _, ovf1 = acc_pot_host(pos1, state.mass, cfg, theta, eps, G,
                                 box_size, slice_chunks)
    vel1 = vel_h + 0.5 * dt * acc1
    return NBodyState(pos1, vel1, state.mass), ovf0 | ovf1


def _build_host(pos, mass, cfg, box_size):
    global _build_jit
    if _build_jit is None:
        _build_jit = jax.jit(_build.build_tree, static_argnames=("cfg",))
    return _build_jit(pos, mass, cfg, None if box_size is None
                      else jnp.asarray(box_size, pos.dtype))


def leapfrog_step_morton_host(state: NBodyState, dt, cfg: TreeConfig,
                              theta, eps, G=1.0, box_size=None,
                              slice_chunks: int = 32):
    """Host-sliced KDK step keeping the state in Morton order across
    steps (the Morton-order-maintaining pattern of leapfrog_step_morton
    at watchdog-safe dispatch sizes — BASELINE configs #2/#3 at 8M+).
    Returns (new_state_in_new_Morton_order, ovf, step_perm)."""
    dt_ = jnp.asarray(dt, state.pos.dtype)
    td0 = _build_host(state.pos, state.mass, cfg, box_size)
    acc0, _, ovf0, _mx = _engine.acc_pot_u_host(td0, cfg, theta, eps, G,
                                                slice_chunks=slice_chunks)
    vel_h = state.vel[td0.perm] + 0.5 * dt_ * acc0
    pos1 = td0.pos + dt_ * vel_h
    td1 = _build_host(pos1, td0.mass, cfg, box_size)
    acc1, _, ovf1, _mx = _engine.acc_pot_u_host(td1, cfg, theta, eps, G,
                                                slice_chunks=slice_chunks)
    vel1 = vel_h[td1.perm] + 0.5 * dt_ * acc1
    step_perm = td0.perm[td1.perm]
    return NBodyState(td1.pos, vel1, td1.mass), ovf0 | ovf1, step_perm


def leapfrog_step_morton_host_safe(state: NBodyState, dt,
                                   cfg: TreeConfig, theta, eps, G=1.0,
                                   box_size=None, slice_chunks: int = 32,
                                   max_retries: int = 4):
    """leapfrog_step_morton_host with cap-overflow RETRY: an overflowed
    interaction list truncates forces, so a step that flags overflow is
    discarded and redone from the same input state with the overflowed
    capacities doubled (VERDICT r4 item 7: config #2's recorded drift
    included truncated steps — the drift diagnostic must never).

    Returns (new_state, ovf(False), step_perm, cfg, n_retries): callers
    thread the (possibly grown) cfg into subsequent steps so the growth
    cost is paid once."""
    import numpy as np
    from .config import grow_overflowed
    n_retries = 0
    for _ in range(max_retries + 1):
        new_state, ovf, perm = leapfrog_step_morton_host(
            state, dt, cfg, theta, eps, G, box_size, slice_chunks)
        flags = np.asarray(ovf)
        if not flags.any():
            return new_state, ovf, perm, cfg, n_retries
        cfg = grow_overflowed(cfg, flags)
        n_retries += 1
    raise RuntimeError(
        f"leapfrog step still overflowing after {max_retries} cap "
        f"doublings (flags {flags.tolist()})")


def total_energy_host(state: NBodyState, cfg: TreeConfig, theta, eps,
                      G=1.0, box_size=None, slice_chunks: int = 32):
    """Tree-based total energy with host-sliced dispatches (the energy-
    drift diagnostic at scales where exact_total_energy is infeasible;
    BASELINE config #2's 8M drift check — pass a small theta)."""
    td = _build_host(state.pos, state.mass, cfg, box_size)
    _, pot_u, _, _ = _engine.acc_pot_u_host(td, cfg, theta, eps, G,
                                            slice_chunks=slice_chunks,
                                            mode="pot")
    ke = 0.5 * jnp.sum(state.mass * jnp.sum(state.vel ** 2, axis=1))
    pe = 0.5 * jnp.sum(td.mass * pot_u)
    return ke + pe


def exact_total_energy(state: NBodyState, eps=0.0, G=1.0):
    from . import direct
    _, pot = direct.direct_acc_pot(state.pos, state.mass, eps=eps, G=G)
    ke = 0.5 * jnp.sum(state.mass * jnp.sum(state.vel ** 2, axis=1))
    pe = 0.5 * jnp.sum(state.mass * pot)
    return ke + pe
