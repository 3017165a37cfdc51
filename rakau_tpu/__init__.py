"""rakau_tpu — TPU-native Barnes-Hut gravitational N-body engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of bluescarni/rakau
(C++17 Barnes-Hut octree library; see SURVEY.md): Morton-ordered particle
store, vectorized level-synchronous octree/quadtree construction, batched
MAC-driven interaction-list traversal, Pallas force/potential kernels, exact
direct-sum oracle, ordered/unordered result views, in-place updates with
cheap rebuild, and multi-chip sharding over a jax Mesh.
"""
from .config import TreeConfig, MAC_BH, MAC_BH_GEOM
from .direct import direct_acc_pot, direct_acc_pot_np
from .tree import Tree, octree, quadtree

__version__ = "0.1.0"

__all__ = [
    "TreeConfig",
    "MAC_BH",
    "MAC_BH_GEOM",
    "direct_acc_pot",
    "direct_acc_pot_np",
    "Tree",
    "octree",
    "quadtree",
]
