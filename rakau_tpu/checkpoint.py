"""Checkpoint/restore for tree state.

The reference has no serialization subsystem — its state is always
reconstructible from (coords, masses) (SURVEY.md §6 "Checkpoint/resume:
absent by design"). The rebuild provides the trivial-but-convenient
equivalent: save the user-order particle arrays + config + box, rebuild
the tree on load. Plain .npz; no external deps."""
from __future__ import annotations

import dataclasses
import json

import numpy as np

from .config import TreeConfig
from .tree import Tree


def save_tree(path: str, tree: Tree) -> None:
    cfg = dataclasses.asdict(tree.config)
    np.savez_compressed(
        path,
        positions=np.asarray(tree.positions_o),
        masses=np.asarray(tree.masses_o),
        box_size=np.asarray(tree.box_size),
        config_json=np.asarray(json.dumps(cfg)),
    )


def load_tree(path: str) -> Tree:
    with np.load(path, allow_pickle=False) as z:
        cfg = TreeConfig(**json.loads(str(z["config_json"])))
        return Tree(coords=z["positions"], masses=z["masses"],
                    box_size=float(z["box_size"]), config=cfg)


def save_state(path: str, pos, vel, mass, **extra) -> None:
    """Save an integration state (positions/velocities/masses + scalars)."""
    np.savez_compressed(path, positions=np.asarray(pos),
                        velocities=np.asarray(vel),
                        masses=np.asarray(mass),
                        **{k: np.asarray(v) for k, v in extra.items()})


def load_state(path: str):
    with np.load(path, allow_pickle=False) as z:
        out = {k: z[k] for k in z.files}
    return out
