"""Data pipeline: ingestion, metadata, collation, loaders.

get_dataset(config) mirrors the reference factory
(datasets/build_dataset.py:15-67) returning (train, valid, test, info) as
MolData views, with a synthetic fallback for hermetic runs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .core import MolData, collate_batch, collate_batch_compact, split_indices
from .datasets_info import DATASET_INFO, get_dataset_info
from .loader import BatchLoader, BucketedLoader
from .process import (decode_compact_batch, make_batch_decoder,
                      prepare_2d_batch, prepare_graph_batch,
                      prepare_node_batch)
from .synthetic import chemical_synthetic_dataset, synthetic_dataset
from . import ingest

__all__ = [
    "MolData",
    "collate_batch",
    "collate_batch_compact",
    "decode_compact_batch",
    "make_batch_decoder",
    "split_indices",
    "DATASET_INFO",
    "get_dataset_info",
    "BatchLoader",
    "BucketedLoader",
    "prepare_graph_batch",
    "prepare_2d_batch",
    "prepare_node_batch",
    "synthetic_dataset",
    "ingest",
    "get_dataset",
    "make_loader",
    "make_bucketed_loader",
]


def get_dataset(config, synthetic_fallback: bool = False, synthetic_size: int = 512):
    """Build (train, valid, test, dataset_info) MolData for `config`.

    `synthetic_fallback`: when the raw files are absent, return a synthetic
    dataset with the same metadata profile instead of raising (tests,
    benchmarks, smoke runs).
    """
    info = get_dataset_info(config.data.info_name)
    name = config.data.name
    try:
        if name == "QM9":
            data = ingest.load_qm9(config.data.root)
            if "cond" in config.exp_type:
                splits = ingest.qm9_cond_splits(len(data))
                return (
                    data.select(splits["first_train"]),
                    data.select(splits["second_train"]),
                    data.select(splits["valid"]),
                    data.select(splits["test"]),
                    info,
                )
            splits = ingest.qm9_splits(len(data))
        elif name == "GeomDrug":
            data = ingest.load_geom(config.data.root, config.data.processed_file)
            splits = split_indices(len(data), "GeomDrug")
        elif name == "Zinc250k":
            data = ingest.load_zinc250k(config.data.root)
            splits = ingest.zinc_splits(config.data.root, len(data))
        elif name == "MOSES":
            data, splits = ingest.load_moses(config.data.root)
        else:
            raise ValueError(f"Undefined dataset name: {name}")
    except (FileNotFoundError, ImportError) as exc:
        if not synthetic_fallback:
            raise
        import logging

        logging.getLogger(__name__).warning(
            "dataset %s unavailable (%s: %s) — FALLING BACK TO SYNTHETIC "
            "DATA (%d molecules). Results will be stamped data='synthetic'. "
            "Fetch the raw files or unset data.allow_synthetic to make this "
            "an error.",
            name, type(exc).__name__, exc, synthetic_size,
        )
        info = dict(info, synthetic=True)
        # data.synthetic_kind: 'chemical' (default) = valence-exact,
        # 3D-stable-by-construction molecules, so quality metrics have a
        # real ceiling; 'random' = the cheap random-graph generator.
        kind = str(config.data.get("synthetic_kind", "chemical"))
        if kind == "chemical" and not config.only_2D:
            data = chemical_synthetic_dataset(
                config.data.info_name, num_mols=synthetic_size,
                max_nodes=int(config.data.max_node))
        elif kind == "chemical":
            # 2D datasets (ZINC/MOSES convention): valence-exact heavy-
            # atom graphs, implicit hydrogens, no 3D embedding — gives the
            # 2D metric stack a real 100%-valid ceiling
            data = chemical_synthetic_dataset(
                config.data.info_name, num_mols=synthetic_size,
                max_nodes=int(config.data.max_node), embed_3d=False)
        else:
            data = synthetic_dataset(
                config.data.info_name, num_mols=synthetic_size,
                with_pos=not config.only_2D,
                max_nodes=int(config.data.max_node))
        splits = split_indices(len(data), "synthetic")
        if "cond" in config.exp_type:
            tr = splits["train"]
            half = len(tr) // 2
            return (
                data.select(tr[:half]),
                data.select(tr[half:]),
                data.select(splits["valid"]),
                data.select(splits["test"]),
                info,
            )

    return (
        data.select(splits["train"]),
        data.select(splits["valid"]),
        data.select(splits["test"]),
        info,
    )


def make_loader(config, data: MolData, pad_n: int, batch_size: int,
                property_values=None, shuffle: bool = True, seed: int = 0,
                compact: Optional[bool] = None):
    if compact is None:
        compact = bool(config.data.get("compact_batches", True))
    return BatchLoader(
        data,
        np.arange(len(data)),
        batch_size=batch_size,
        pad_n=pad_n,
        num_atom_types=config.data.atom_types,
        compress_edge=config.data.compress_edge,
        include_aromatic=config.data.include_aromatic,
        bond_types=config.data.bond_types,
        property_values=property_values,
        shuffle=shuffle,
        seed=seed,
        compact=compact,
    )


def make_bucketed_loader(config, data: MolData, pads, batch_size: int,
                         property_values=None, seed: int = 0,
                         compact: Optional[bool] = None):
    """Train-side pad ladder (see BucketedLoader): each multi-step chunk
    runs at its bucket's pad instead of the dataset max."""
    if compact is None:
        compact = bool(config.data.get("compact_batches", True))
    return BucketedLoader(
        data,
        np.arange(len(data)),
        batch_size=batch_size,
        pads=pads,
        num_atom_types=config.data.atom_types,
        compress_edge=config.data.compress_edge,
        include_aromatic=config.data.include_aromatic,
        bond_types=config.data.bond_types,
        property_values=property_values,
        seed=seed,
        compact=compact,
        batch_scale_cap=float(
            config.training.get("bucket_batch_scale", 1.0) or 1.0),
    )
