"""Synthetic molecule-like dataset.

Generates random but structurally plausible graphs (random spanning tree +
extra edges, roughly bond-length-scaled 3D coordinates) matching a dataset
metadata profile. Used by tests and throughput benchmarks so the full
pipeline runs hermetically without the external QM9/GEOM downloads.
"""

from __future__ import annotations

import numpy as np

from .core import MolData
from .datasets_info import get_dataset_info

__all__ = ["synthetic_dataset"]


def synthetic_dataset(
    info_name: str = "qm9_with_h",
    num_mols: int = 256,
    seed: int = 0,
    with_pos: bool = True,
    num_props: int = 19,
    max_nodes: int = 0,
) -> MolData:
    info = get_dataset_info(info_name)
    rng = np.random.default_rng(seed)
    sizes = np.array(sorted(info["train_n_nodes"].keys()))
    probs = np.array([info["train_n_nodes"][s] for s in sizes], np.float64)
    if max_nodes:
        keep = sizes <= max_nodes
        sizes, probs = sizes[keep], probs[keep]
    probs /= probs.sum()
    n_types = len(info["atom_decoder"])

    mols = []
    for _ in range(num_mols):
        n = int(rng.choice(sizes, p=probs))
        atom_type = rng.integers(0, n_types, size=n)
        fc = np.zeros(n, np.int16)
        # random spanning tree bonds + a few extras
        src, dst, bt = [], [], []
        for i in range(1, n):
            j = int(rng.integers(0, i))
            order = int(rng.choice([1, 1, 1, 2, 3], p=[0.5, 0.2, 0.1, 0.15, 0.05]))
            src += [i, j]
            dst += [j, i]
            bt += [order, order]
        pos = None
        if with_pos:
            pos = rng.normal(scale=1.5, size=(n, 3)).astype(np.float32)
            pos -= pos.mean(0, keepdims=True)
        y = rng.normal(size=(num_props,)) if num_props else None
        mols.append(
            dict(atom_type=atom_type, fc=fc, pos=pos,
                 bond_src=src, bond_dst=dst, bond_type=bt, y=y)
        )
    return MolData.from_molecules(mols, info)
