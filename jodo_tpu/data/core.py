"""In-memory molecular dataset container + static-shape batch collation.

TPU-first data design (SURVEY.md section 7): molecules live in flat ragged
NumPy arrays (one concatenation per field + offsets), and collation pads
every batch to the *dataset-wide* static N so a single jit compilation
serves all batches — replacing the reference's per-batch max-N repadding
through DataLoader workers (datasets/build_dataset.py:336-451).

A C++ fast path for `collate` is provided by jodo_tpu.runtime (falls back
to the NumPy implementation here).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import numpy as np

__all__ = ["MolData", "collate_batch", "collate_batch_compact", "split_indices"]


@dataclasses.dataclass
class MolData:
    """Ragged container. Bond lists store each undirected bond once per
    direction (i->j and j->i) with integer bond codes 1..4 (4=aromatic)."""

    n_nodes: np.ndarray  # [M] int32
    atom_type: np.ndarray  # [A_tot] int16
    formal_charge: np.ndarray  # [A_tot] int16
    pos: Optional[np.ndarray]  # [A_tot, 3] float32 or None (2D-only sets)
    atom_offsets: np.ndarray  # [M+1] int64
    bond_src: np.ndarray  # [B_tot] int32 (local atom index)
    bond_dst: np.ndarray  # [B_tot] int32
    bond_type: np.ndarray  # [B_tot] int16
    bond_offsets: np.ndarray  # [M+1] int64
    y: Optional[np.ndarray]  # [M, P] float64 properties or None
    info: dict  # dataset_info metadata
    rdmols: Optional[list] = None  # optional parallel list of RDKit mols

    def __len__(self) -> int:
        return len(self.n_nodes)

    @staticmethod
    def from_molecules(mols: List[dict], info: dict, keep_rdmols: bool = False):
        """mols: list of dicts with keys atom_type [n], fc [n], pos [n,3]?,
        bond_src/bond_dst/bond_type (directed, both directions), y?."""
        n_nodes = np.array([len(m["atom_type"]) for m in mols], np.int32)
        atom_offsets = np.zeros(len(mols) + 1, np.int64)
        np.cumsum(n_nodes, out=atom_offsets[1:])
        bond_counts = np.array([len(m["bond_type"]) for m in mols], np.int64)
        bond_offsets = np.zeros(len(mols) + 1, np.int64)
        np.cumsum(bond_counts, out=bond_offsets[1:])

        atom_type = np.concatenate([np.asarray(m["atom_type"], np.int16) for m in mols])
        fc = np.concatenate([np.asarray(m["fc"], np.int16) for m in mols])
        has_pos = mols[0].get("pos") is not None
        pos = (
            np.concatenate([np.asarray(m["pos"], np.float32) for m in mols])
            if has_pos
            else None
        )
        bond_src = np.concatenate(
            [np.asarray(m["bond_src"], np.int32) for m in mols]
        ) if bond_offsets[-1] else np.zeros(0, np.int32)
        bond_dst = np.concatenate(
            [np.asarray(m["bond_dst"], np.int32) for m in mols]
        ) if bond_offsets[-1] else np.zeros(0, np.int32)
        bond_type = np.concatenate(
            [np.asarray(m["bond_type"], np.int16) for m in mols]
        ) if bond_offsets[-1] else np.zeros(0, np.int16)
        y = None
        if mols[0].get("y") is not None:
            y = np.stack([np.asarray(m["y"], np.float64) for m in mols])
        rdmols = [m.get("rdmol") for m in mols] if keep_rdmols else None
        return MolData(
            n_nodes, atom_type, fc, pos, atom_offsets,
            bond_src, bond_dst, bond_type, bond_offsets, y, info, rdmols,
        )

    def select(self, indices: np.ndarray) -> "MolData":
        """Subset view (copies the ragged fields)."""
        indices = np.asarray(indices)
        mols = []
        for i in indices:
            a0, a1 = self.atom_offsets[i], self.atom_offsets[i + 1]
            b0, b1 = self.bond_offsets[i], self.bond_offsets[i + 1]
            mols.append(
                dict(
                    atom_type=self.atom_type[a0:a1],
                    fc=self.formal_charge[a0:a1],
                    pos=self.pos[a0:a1] if self.pos is not None else None,
                    bond_src=self.bond_src[b0:b1],
                    bond_dst=self.bond_dst[b0:b1],
                    bond_type=self.bond_type[b0:b1],
                    y=self.y[i] if self.y is not None else None,
                    rdmol=self.rdmols[i] if self.rdmols is not None else None,
                )
            )
        return MolData.from_molecules(mols, self.info, keep_rdmols=self.rdmols is not None)


def collate_batch(
    data: MolData,
    indices: np.ndarray,
    pad_n: int,
    num_atom_types: int,
    compress_edge: bool = True,
    include_aromatic: bool = False,
    bond_types: int = 4,
    property_values: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Assemble a dense padded batch.

    Edge encoding matches the reference transforms
    (datasets/build_dataset.py:95-306):
      compress_edge ("EdgeCom"): [exist, order/3 (aromatic->0), (aromatic)]
      otherwise      ("Edge"):   one-hot over bond codes 1..bond_types-1
    """
    b = len(indices)
    edge_ch = (2 + int(include_aromatic)) if compress_edge else (bond_types - 1)

    sizes = data.n_nodes[np.asarray(indices)]
    if sizes.max(initial=0) > pad_n:
        raise ValueError(
            f"molecule with {int(sizes.max())} atoms exceeds pad_n={pad_n}"
        )

    one_hot = np.zeros((b, pad_n, num_atom_types), np.float32)
    positions = np.zeros((b, pad_n, 3), np.float32)
    fc = np.zeros((b, pad_n, 1), np.float32)
    edge_feat = np.zeros((b, pad_n, pad_n, edge_ch), np.float32)
    node_mask = np.zeros((b, pad_n), np.float32)

    for k, i in enumerate(indices):
        a0, a1 = data.atom_offsets[i], data.atom_offsets[i + 1]
        n = a1 - a0
        at = data.atom_type[a0:a1].astype(np.int64)
        one_hot[k, np.arange(n), at] = 1.0
        if data.pos is not None:
            positions[k, :n] = data.pos[a0:a1]
        fc[k, :n, 0] = data.formal_charge[a0:a1]
        node_mask[k, :n] = 1.0

        b0, b1 = data.bond_offsets[i], data.bond_offsets[i + 1]
        src = data.bond_src[b0:b1].astype(np.int64)
        dst = data.bond_dst[b0:b1].astype(np.int64)
        bt = data.bond_type[b0:b1].astype(np.int64)
        if compress_edge:
            order = np.where(bt == 4, 0, bt).astype(np.float32) / 3.0
            edge_feat[k, src, dst, 1] = order
            if include_aromatic:
                edge_feat[k, src, dst, 2] = (bt == 4).astype(np.float32)
            edge_feat[k, src, dst, 0] = 1.0
        else:
            valid = (bt >= 1) & (bt < bond_types)
            edge_feat[k, src[valid], dst[valid], bt[valid] - 1] = 1.0

    edge_mask = node_mask[:, :, None] * node_mask[:, None, :]
    edge_mask *= 1.0 - np.eye(pad_n, dtype=np.float32)[None]

    batch = dict(
        positions=positions,
        atom_one_hot=one_hot,
        formal_charges=fc,
        edge_one_hot=edge_feat,
        node_mask=node_mask,
        edge_mask=edge_mask,
    )
    if property_values is not None:
        batch["context"] = np.asarray(
            property_values[indices], np.float32
        ).reshape(b, -1)
    return batch


# bond_code packs dominate pack memory (M * pad_n^2 int8); above this cap
# (GEOM-scale: 292k mols * 184^2 ~= 10GB) fall back to per-batch collate
_PACK_BYTES_CAP = int(os.environ.get("JODO_PACK_BYTES_CAP", 512 * 1024 * 1024))


def _compact_pack(data: MolData, pad_n: int):
    """Per-molecule padded compact arrays, cached on the dataset object.

    ONE pack is kept, built at the dataset's own max size (>= pad_n), so
    it serves every bucket pad of a bucketed loader: a pad_n batch is
    `pack[k][indices][..., :pad_n(, :pad_n)]` — identical bytes to the
    per-molecule loop, because molecules routed to a pad_n bucket fit in
    pad_n and their pack rows are zero/-1 beyond their own size. Returns
    None when the pack would exceed the memory cap."""
    m = len(data.n_nodes)
    pad_full = max(pad_n, int(data.n_nodes.max(initial=0)))
    if m * pad_full * pad_full > _PACK_BYTES_CAP:
        return None
    cache = getattr(data, "_compact_packs", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(data, "_compact_packs", cache)
        except (AttributeError, TypeError):
            return None  # slotted/frozen containers: no cache, slow path
    if not cache or cache["pad"] < pad_full:
        cache["pad"] = pad_full
        cache["pack"] = _collate_compact_loop(data, np.arange(m), pad_full)
    return cache["pack"]


def collate_batch_compact(
    data: MolData,
    indices: np.ndarray,
    pad_n: int,
    property_values: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Integer-coded batch for cheap host collate + host->device transfer.

    The dense float batch (collate_batch) moves ~1.7MB per 128-molecule QM9
    batch, dominated by the [B,N,N,E] float edge one-hots and the [B,N,N]
    edge mask — ~9x more bytes than the information content. Over a
    tunneled/remote TPU link (~80MB/s measured) that transfer alone costs
    ~21ms/step at steps_per_dispatch chunking, serialising with compute.
    This collate emits the minimal integer encoding; prepare_*_batch
    expands it to the float batch ON DEVICE (data/process.py:
    decode_compact_batch), where the one-hot/mask construction is a few
    fused VPU ops. Encoding:

      positions  [B,N,3] f32   (absent for 2D-only datasets)
      atom_types [B,N]   int8  (-1 at padding -> one_hot gives zeros)
      charges    [B,N]   int8  formal charges
      bond_code  [B,N,N] int8  directed bond codes 0=none,1..3=order,4=arom
      n_nodes    [B]     int32 (node/edge masks derive on device)
      context    [B,P]   f32   (when property_values given)
    """
    idx = np.asarray(indices)
    b = len(idx)
    sizes = data.n_nodes[idx]
    if sizes.max(initial=0) > pad_n:
        raise ValueError(
            f"molecule with {int(sizes.max())} atoms exceeds pad_n={pad_n}"
        )

    # fast path: pre-tensorised per-molecule padded arrays (built once per
    # (dataset, pad)) make a batch one numpy gather each — the per-molecule
    # Python loop below costs ~0.5s per 32-step dispatch chunk on QM9,
    # enough to make the producer thread (not the device) the training
    # bottleneck (~11.5 vs 15.5 it/s flagship-scale)
    pack = _compact_pack(data, pad_n)
    if pack is not None:
        batch = {}
        for k, v in pack.items():
            g = v[idx]
            if k == "bond_code":
                g = g[:, :pad_n, :pad_n]
            else:  # atom_types/charges [M,P]; positions [M,P,3]
                g = g[:, :pad_n]
            batch[k] = np.ascontiguousarray(g)
        batch["n_nodes"] = sizes.astype(np.int32)
        if property_values is not None:
            batch["context"] = np.asarray(
                property_values[idx], np.float32
            ).reshape(b, -1)
        return batch

    batch = _collate_compact_loop(data, idx, pad_n)
    batch["n_nodes"] = sizes.astype(np.int32)
    if property_values is not None:
        batch["context"] = np.asarray(
            property_values[idx], np.float32
        ).reshape(b, -1)
    return batch


def _collate_compact_loop(
    data: MolData, indices: np.ndarray, pad_n: int
) -> Dict[str, np.ndarray]:
    """Per-molecule padded compact arrays (no n_nodes/context) — the loop
    shared by collate_batch_compact's slow path and _compact_pack's
    one-time full-dataset build."""
    b = len(indices)
    atom_types = np.full((b, pad_n), -1, np.int8)
    charges = np.zeros((b, pad_n), np.int8)
    bond_code = np.zeros((b, pad_n, pad_n), np.int8)
    has_pos = data.pos is not None
    positions = np.zeros((b, pad_n, 3), np.float32) if has_pos else None

    for k, i in enumerate(indices):
        a0, a1 = data.atom_offsets[i], data.atom_offsets[i + 1]
        n = a1 - a0
        atom_types[k, :n] = data.atom_type[a0:a1]
        charges[k, :n] = data.formal_charge[a0:a1]
        if has_pos:
            positions[k, :n] = data.pos[a0:a1]
        b0, b1 = data.bond_offsets[i], data.bond_offsets[i + 1]
        bond_code[
            k,
            data.bond_src[b0:b1].astype(np.int64),
            data.bond_dst[b0:b1].astype(np.int64),
        ] = data.bond_type[b0:b1].astype(np.int8)

    batch = dict(
        atom_types=atom_types,
        charges=charges,
        bond_code=bond_code,
    )
    if has_pos:
        batch["positions"] = positions
    return batch


def split_indices(n: int, name: str = "QM9", seed: int = 0):
    """Reproduce the reference splits.

    QM9: fixed 100k train / ~10% test / rest valid under np seed 0
    permutation (qm9_dataset.py:272-297). Others: 80/10/10 random split
    (geom_dataset.py:29-55) or dataset-provided splits handled upstream.
    """
    if name == "QM9" and n > 110000:
        train_num = 100000
        test_num = int(0.1 * n)
        valid_num = n - train_num - test_num
    else:
        train_num = int(0.8 * n)
        valid_num = int(0.1 * n)
        test_num = n - train_num - valid_num
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    train = perm[:train_num]
    valid = perm[train_num : train_num + valid_num]
    test = perm[train_num + valid_num : train_num + valid_num + test_num]
    return {"train": train, "valid": valid, "test": test}
