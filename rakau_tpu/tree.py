"""User-facing Tree API — parity with the reference's public surface.

Reference (rakau `tree.hpp` public section, SURVEY.md L5/C9/C11/C12):
`octree<F, 3>` / `quadtree<F, 2>` constructed from coordinate/mass arrays
with kwargs (box_size, max_leaf_n, ncrit), queried via
`accs_u/o`, `pots_u/o`, `accs_pots_u/o` with per-call theta/eps (igor
kwargs), updated in place via `update_positions_u/o` / `update_masses_u/o`
with permutation composition, plus `exact_*` direct-sum oracles and
accessors (perm/inv_perm/last_perm, box_size, sizes).

TPU-native differences: queries are jitted per TreeConfig and run on
device; interaction-list capacities are static shapes with an automatic
grow-and-retry loop on overflow (the reference has no such concept — its
lists are dynamic); `split` (CPU/GPU fractions) is superseded by the
sharding layer in rakau_tpu.parallel.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from . import build as _build
from . import direct as _direct
from . import engine as _engine
from . import particles as _particles
from .config import TreeConfig
from .utils.timing import phase_timer

_OVF_FIELDS = ("m2p_cap", "p2p_leaf_cap", "p2p_src_cap", "frontier_cap")


@partial(jax.jit, static_argnames=("cfg",))
def _build_jit(pos, mass, cfg, box_size):
    return _build.build_tree(pos, mass, cfg, box_size=box_size)


def _query_host(td, cfg, theta, eps, G, mode="both"):
    # Host-sliced driver: bounded per-dispatch runtime (TPU watchdog kills
    # executables past ~60 s) with identical results.
    return _engine.acc_pot_u_host(td, cfg, theta, eps, G, mode=mode)


def _stack_coords(coords, x_coords, y_coords, z_coords, ndim):
    if coords is not None:
        pos = jnp.asarray(coords)
        if pos.ndim != 2 or pos.shape[1] != ndim:
            raise ValueError(
                f"coords must be [N, {ndim}], got {pos.shape}")
        return pos
    comps = [x_coords, y_coords, z_coords][:ndim]
    if any(c is None for c in comps):
        raise ValueError(
            "provide either coords=[N, ndim] or all of "
            + "/".join(["x_coords", "y_coords", "z_coords"][:ndim]))
    return jnp.stack([jnp.asarray(c) for c in comps], axis=1)


class Tree:
    """Barnes-Hut tree over point masses (octree in 3D, quadtree in 2D)."""

    def __init__(self, coords=None, masses=None, *, x_coords=None,
                 y_coords=None, z_coords=None, box_size=None,
                 ndim: int = 3, dtype=None, max_leaf_n: int = 64,
                 ncrit: int = 256, mac: str = "bh",
                 multipole_order: int = 0, config: Optional[TreeConfig] = None,
                 max_retries: int = 6, **cfg_kwargs):
        if config is not None:
            cfg = config
        else:
            if dtype is None:
                probe = coords if coords is not None else x_coords
                d = jnp.asarray(probe).dtype
                dtype = str(d) if d in (jnp.dtype("float32"),
                                        jnp.dtype("float64")) else "float32"
            cfg = TreeConfig(ndim=ndim, dtype=str(dtype),
                             max_leaf_n=max_leaf_n, ncrit=ncrit, mac=mac,
                             multipole_order=multipole_order, **cfg_kwargs)
        self._cfg = cfg
        self._max_retries = max_retries
        pos = _stack_coords(coords, x_coords, y_coords, z_coords,
                            cfg.ndim).astype(cfg.jdtype)
        if masses is None:
            raise ValueError("masses is required")
        mass = jnp.asarray(masses, cfg.jdtype)
        if box_size is None:
            box = _particles.auto_box_size(pos)
        else:
            box = jnp.asarray(float(box_size), cfg.jdtype)
        _particles.raise_on_invalid(pos, mass, box)
        self._box = box
        # perm maps Morton slot -> ORIGINAL user index, composed across
        # updates (reference C9/C11); last_perm is the most recent re-sort.
        self._orig_perm = None
        self._last_perm = None
        self._rebuild(pos, mass)

    # ------------------------------------------------------------- build
    def _rebuild(self, pos, mass):
        """Full re-sort + rebuild (the update_* paths too: the r1-r4
        near-sorted incremental re-sort was measured refuted at device
        scale and deleted, build.sort_by_code)."""
        cfg = self._cfg
        for _ in range(self._max_retries):
            with phase_timer("tree_build"):
                td = _build_jit(pos, mass, cfg, self._box)
            if not bool(td.overflow):
                break
            cfg = cfg.with_(
                node_cap=2 * cfg.node_capacity(pos.shape[0]),
                tile_cap=2 * cfg.tile_capacity(pos.shape[0]))
        else:
            raise RuntimeError("tree build overflow persisted after retries")
        self._cfg = cfg
        self._td = td
        step_perm = np.asarray(td.perm)
        self._last_perm = step_perm
        if self._orig_perm is None:
            self._orig_perm = step_perm
        else:
            self._orig_perm = self._orig_perm[step_perm]
        self._inv_orig = np.argsort(self._orig_perm)

    # ------------------------------------------------------------ queries
    def _query(self, theta, eps, G, mode="both"):
        cfg = self._cfg
        dt = cfg.jdtype
        if (cfg.traversal_mode == "lmac" and cfg.mac == "bh_geom"
                and float(theta) > 2.0 / cfg.ndim ** 0.5):
            # lmac's partition proof needs A(t,parent) => A(t,child);
            # with bh_geom's delta term that holds for theta <= 2/sqrt(D)
            # (traversal3.py docstring)
            raise ValueError(
                f"traversal_mode='lmac' with mac='bh_geom' requires "
                f"theta <= {2.0 / cfg.ndim ** 0.5:.3f} "
                f"(monotonicity bound); got {float(theta)}")
        for _ in range(self._max_retries):
            with phase_timer("traverse+eval"):
                acc, pot, ovf, mx = _query_host(
                    self._td, cfg, jnp.asarray(theta, dt),
                    jnp.asarray(eps, dt), jnp.asarray(G, dt), mode=mode)
            flags = np.asarray(ovf)
            if not flags.any():
                self._last_stats = np.asarray(mx)
                return acc, pot
            # Grow every overflowed capacity (never silently truncate).
            updates = {f: 2 * getattr(cfg, f)
                       for f, hit in zip(_OVF_FIELDS, flags) if hit}
            cfg = cfg.with_(**updates)
            self._cfg = cfg
        raise RuntimeError(
            f"interaction-list overflow persisted after retries: {flags}")

    def tune_caps(self, slack: float = 1.25, quantum: int = 512):
        """Shrink interaction-list capacities to the maxima measured by
        the most recent query (adaptive-static tuning; the next query
        recompiles once with snug caps — padding waste is the main TPU
        performance cost, SURVEY.md §8)."""
        if getattr(self, "_last_stats", None) is None:
            raise RuntimeError("run a query first")
        from .config import fit_caps
        self._cfg = fit_caps(self._cfg, self._last_stats, slack=slack,
                             quantum=quantum)
        return self._cfg

    def accs_pots_u(self, theta, eps=0.0, G=1.0):
        """Accelerations and potentials, internal Morton ("unordered")
        order. Reference: accs_pots_u (SURVEY.md C9)."""
        return self._query(theta, eps, G)

    def accs_pots_o(self, theta, eps=0.0, G=1.0):
        acc, pot = self._query(theta, eps, G)
        inv = jnp.asarray(self._inv_orig)
        return acc[inv], pot[inv]

    def accs_u(self, theta, eps=0.0, G=1.0):
        """Accelerations only — the potential reductions are skipped in
        the kernel (work parity with the reference's accs_u, not just API
        parity; VERDICT r1 item 9)."""
        return self._query(theta, eps, G, mode="acc")[0]

    def accs_o(self, theta, eps=0.0, G=1.0):
        acc = self._query(theta, eps, G, mode="acc")[0]
        return acc[jnp.asarray(self._inv_orig)]

    def pots_u(self, theta, eps=0.0, G=1.0):
        """Potentials only — the ndim acceleration reductions are skipped
        in the kernel."""
        return self._query(theta, eps, G, mode="pot")[1]

    def pots_o(self, theta, eps=0.0, G=1.0):
        pot = self._query(theta, eps, G, mode="pot")[1]
        return pot[jnp.asarray(self._inv_orig)]

    # ------------------------------------------------- exact (direct sum)
    def exact_accs_pots_u(self, eps=0.0, G=1.0):
        """O(N^2) direct-sum oracle, Morton order (reference C10)."""
        with phase_timer("direct_sum"):
            return _direct.direct_acc_pot(self._td.pos, self._td.mass,
                                          eps=eps, G=G)

    def exact_accs_pots_o(self, eps=0.0, G=1.0):
        acc, pot = self.exact_accs_pots_u(eps, G)
        inv = jnp.asarray(self._inv_orig)
        return acc[inv], pot[inv]

    def exact_accs_u(self, eps=0.0, G=1.0):
        return self.exact_accs_pots_u(eps, G)[0]

    def exact_accs_o(self, eps=0.0, G=1.0):
        return self.exact_accs_pots_o(eps, G)[0]

    def exact_pots_u(self, eps=0.0, G=1.0):
        return self.exact_accs_pots_u(eps, G)[1]

    def exact_pots_o(self, eps=0.0, G=1.0):
        return self.exact_accs_pots_o(eps, G)[1]

    # ----------------------------------------------------------- updates
    def update_positions_u(self, new_positions: Union[Callable, jnp.ndarray]):
        """Replace positions (array in Morton order, or a callable applied
        to the Morton-order positions), then re-sort and rebuild, composing
        permutations so `_o` views keep mapping to the original input
        order. Reference: update_positions_u (SURVEY.md C11)."""
        pos = (new_positions(self._td.pos) if callable(new_positions)
               else jnp.asarray(new_positions, self._cfg.jdtype))
        if pos.shape != self._td.pos.shape:
            raise ValueError(f"positions shape {pos.shape} != "
                             f"{self._td.pos.shape}")
        _particles.raise_on_invalid(pos, self._td.mass, self._box)
        self._rebuild(pos, self._td.mass)

    def update_positions_o(self, new_positions: Union[Callable, jnp.ndarray]):
        cur_o = self.positions_o
        pos_o = (new_positions(cur_o) if callable(new_positions)
                 else jnp.asarray(new_positions, self._cfg.jdtype))
        if pos_o.shape != cur_o.shape:
            raise ValueError("positions shape mismatch")
        pos_u = pos_o[jnp.asarray(self._orig_perm)]
        _particles.raise_on_invalid(pos_u, self._td.mass, self._box)
        self._rebuild(pos_u, self._td.mass)

    def update_masses_u(self, new_masses: Union[Callable, jnp.ndarray]):
        """Replace masses (Morton order or callable); re-sorts/rebuilds to
        refresh node mass/COM properties (reference: update_masses_u)."""
        m = (new_masses(self._td.mass) if callable(new_masses)
             else jnp.asarray(new_masses, self._cfg.jdtype))
        if m.shape != self._td.mass.shape:
            raise ValueError("masses shape mismatch")
        _particles.raise_on_invalid(self._td.pos, m, self._box)
        self._rebuild(self._td.pos, m)

    def update_masses_o(self, new_masses: Union[Callable, jnp.ndarray]):
        cur_o = self.masses_o
        m_o = (new_masses(cur_o) if callable(new_masses)
               else jnp.asarray(new_masses, self._cfg.jdtype))
        if m_o.shape != cur_o.shape:
            raise ValueError("masses shape mismatch")
        m_u = m_o[jnp.asarray(self._orig_perm)]
        _particles.raise_on_invalid(self._td.pos, m_u, self._box)
        self._rebuild(self._td.pos, m_u)

    # --------------------------------------------------------- accessors
    @property
    def nparts(self) -> int:
        return int(self._td.pos.shape[0])

    def __len__(self) -> int:
        return self.nparts

    @property
    def box_size(self) -> float:
        return float(self._box)

    @property
    def config(self) -> TreeConfig:
        return self._cfg

    @property
    def perm(self):
        """Morton slot -> original user index (composed across updates)."""
        return self._orig_perm

    @property
    def inv_perm(self):
        """Original user index -> Morton slot."""
        return self._inv_orig

    @property
    def last_perm(self):
        """Permutation applied by the most recent sort/update only."""
        return self._last_perm

    @property
    def positions_u(self):
        return self._td.pos

    @property
    def positions_o(self):
        return self._td.pos[jnp.asarray(self._inv_orig)]

    @property
    def masses_u(self):
        return self._td.mass

    @property
    def masses_o(self):
        return self._td.mass[jnp.asarray(self._inv_orig)]

    @property
    def tree_data(self):
        """The underlying flat-tree pytree (advanced use / sharding)."""
        return self._td

    @property
    def n_nodes(self) -> int:
        return int(self._td.n_nodes)

    def __repr__(self):
        c = self._cfg
        return (f"{type(self).__name__}(n={self.nparts}, ndim={c.ndim}, "
                f"dtype={c.dtype}, mac={c.mac}, max_leaf_n={c.max_leaf_n}, "
                f"ncrit={c.ncrit}, nodes={self.n_nodes}, "
                f"box={self.box_size:g})")


class octree(Tree):
    """3D alias (reference: `using octree = tree<3, F, ...>`)."""

    def __init__(self, *args, **kw):
        kw.setdefault("ndim", 3)
        assert kw["ndim"] == 3
        super().__init__(*args, **kw)


class quadtree(Tree):
    """2D alias (reference: `using quadtree = tree<2, F, ...>`)."""

    def __init__(self, *args, **kw):
        kw.setdefault("ndim", 2)
        assert kw["ndim"] == 2
        super().__init__(*args, **kw)
