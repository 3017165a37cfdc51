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


def exact_total_energy(state: NBodyState, eps=0.0, G=1.0):
    from . import direct
    _, pot = direct.direct_acc_pot(state.pos, state.mass, eps=eps, G=G)
    ke = 0.5 * jnp.sum(state.mass * jnp.sum(state.vel ** 2, axis=1))
    pe = 0.5 * jnp.sum(state.mass * pot)
    return ke + pe
