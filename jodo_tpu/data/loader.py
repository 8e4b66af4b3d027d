"""Infinite shuffled batch iterator over a MolData container.

Replaces the reference's DataLoader-worker pipeline (build_dataset.py:80-90
+ inf_iterator): batches are assembled by the (optionally C++-accelerated)
static-shape collate and double-buffered by a background thread so host
assembly overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from .core import MolData, collate_batch

__all__ = ["BatchLoader"]


def _get_collate():
    try:
        from ..runtime import fast_collate  # C++ fast path

        return fast_collate
    except Exception:
        return collate_batch


class BatchLoader:
    def __init__(
        self,
        data: MolData,
        indices: np.ndarray,
        batch_size: int,
        pad_n: int,
        num_atom_types: int,
        compress_edge: bool = True,
        include_aromatic: bool = False,
        bond_types: int = 4,
        property_values: Optional[np.ndarray] = None,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.data = data
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.pad_n = pad_n
        self.num_atom_types = num_atom_types
        self.compress_edge = compress_edge
        self.include_aromatic = include_aromatic
        self.bond_types = bond_types
        self.property_values = property_values
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._collate = _get_collate()
        self._prefetch = prefetch

    def __len__(self):
        return int(np.ceil(len(self.indices) / self.batch_size))

    def _epoch_order(self):
        if self.shuffle:
            return self._rng.permutation(self.indices)
        return self.indices

    def _make_batch(self, idx) -> Dict[str, np.ndarray]:
        return self._collate(
            self.data,
            idx,
            self.pad_n,
            self.num_atom_types,
            self.compress_edge,
            self.include_aromatic,
            self.bond_types,
            self.property_values,
        )

    def epoch(self, include_tail: bool = False) -> Iterator[Dict[str, np.ndarray]]:
        """One pass over the data in fixed-size batches (static shapes).

        include_tail: also yield the final partial batch, filled up to
        batch_size by cycling samples from the epoch start (static shapes
        forbid a ragged batch; the duplicates slightly over-weight a few
        samples in split-mean statistics, which beats dropping the tail
        outright — reference DataLoader semantics keep the tail too).
        """
        order = self._epoch_order()
        full_end = (len(order) // self.batch_size) * self.batch_size
        for i in range(0, full_end, self.batch_size):
            yield self._make_batch(order[i : i + self.batch_size])
        rem = len(order) - full_end
        if include_tail and rem > 0:
            tail = order[full_end:]
            fill = np.resize(order, self.batch_size - rem) if len(order) else tail
            yield self._make_batch(np.concatenate([tail, fill]))

    def infinite(self) -> Iterator[Dict[str, np.ndarray]]:
        """Endless stream with background prefetch (pipeline the host
        collate with device steps)."""
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()

        def producer():
            while not stop.is_set():
                for batch in self.epoch():
                    if stop.is_set():
                        return
                    q.put(batch)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
