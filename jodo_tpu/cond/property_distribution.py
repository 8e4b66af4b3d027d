"""Empirical property prior p(property | n_nodes) as binned categoricals.

NumPy re-design of the reference DistributionProperty
(cond_gen/property_distribution.py:4-98): per atom-count histograms with
1000 bins, uniform within-bin sampling, mean/MAD normalisation.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

__all__ = ["DistributionProperty", "compute_mean_mad"]


def compute_mean_mad(values: np.ndarray) -> dict:
    mean = float(np.mean(values))
    mad = float(np.mean(np.abs(values - mean)))
    return {"mean": mean, "mad": mad}


class DistributionProperty:
    def __init__(self, num_atoms: np.ndarray, prop_values: np.ndarray,
                 properties: List[str], num_bins: int = 1000,
                 normalizer: Optional[dict] = None, seed: int = 0):
        """num_atoms [M]; prop_values [M, P] raw property values."""
        self.num_bins = num_bins
        self.properties = properties
        self.n_prop = len(properties)
        self.normalizer = normalizer
        self._rng = np.random.default_rng(seed)
        self.distributions: Dict[str, Dict[int, dict]] = {p: {} for p in properties}

        num_atoms = np.asarray(num_atoms)
        prop_values = np.asarray(prop_values, np.float64).reshape(len(num_atoms), -1)
        for n in range(int(num_atoms.min()), int(num_atoms.max()) + 1):
            vals = prop_values[num_atoms == n]
            if len(vals) == 0:
                continue
            self._build(vals, n)

    def _build(self, values: np.ndarray, n_nodes: int):
        prop_min = values.min(axis=0)
        prop_max = values.max(axis=0)
        prop_range = prop_max - prop_min + 1e-12
        for i, prop in enumerate(self.properties):
            idx = ((values[:, i] - prop_min[i]) / prop_range[i] * self.num_bins)
            idx = np.clip(idx.astype(np.int64), 0, self.num_bins - 1)
            hist = np.bincount(idx, minlength=self.num_bins).astype(np.float64)
            self.distributions[prop][n_nodes] = {
                "probs": hist / hist.sum(),
                "params": (float(prop_min[i]), float(prop_max[i])),
            }

    def set_normalizer(self, normalizer: dict):
        self.normalizer = normalizer

    def _normalize(self, value: float, prop: str) -> float:
        assert self.normalizer is not None
        m = self.normalizer[prop]
        return (value - m["mean"]) / m["mad"]

    def sample(self, n_nodes: int) -> np.ndarray:
        vals = []
        for prop in self.properties:
            dist = self.distributions[prop][int(n_nodes)]
            idx = self._rng.choice(self.num_bins, p=dist["probs"])
            lo, hi = dist["params"]
            rng = hi - lo
            left = idx / self.num_bins * rng + lo
            right = (idx + 1) / self.num_bins * rng + lo
            val = self._rng.uniform(left, right)
            vals.append(self._normalize(val, prop))
        return np.asarray(vals)

    def sample_batch(self, n_nodes_list) -> np.ndarray:
        return np.stack([self.sample(int(n)) for n in n_nodes_list])
