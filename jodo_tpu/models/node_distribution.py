"""Atom-count prior: categorical over the training n_nodes histogram.

Host-side NumPy (node counts are sampled outside the jit region, as in the
reference, sampling.py:179). Mirrors models/node_distribution.py:5-48.
"""

from __future__ import annotations

import numpy as np

__all__ = ["DistributionNodes", "get_node_dist"]


class DistributionNodes:
    def __init__(self, histogram: dict, seed: int = 0):
        self.n_nodes = np.array(sorted(histogram.keys()), dtype=np.int64)
        prob = np.array([histogram[k] for k in self.n_nodes], dtype=np.float64)
        self.prob = prob / prob.sum()
        self._seed = int(seed)
        self._rng = np.random.default_rng(seed)
        self.entropy = float(np.sum(self.prob * np.log(self.prob + 1e-30)))

    def sample(self, n_samples: int = 1, seed=None) -> np.ndarray:
        """Draw atom counts. With seed=None the internal (stateful) stream
        advances, as the reference's torch.multinomial does. With an
        explicit seed the draw is a pure function of (init seed, seed) —
        required so a sampling run's round plan can be predicted (and its
        bucket programs warm-compiled) before the timed call (r4 bench
        bug: the warm call's stateful draw covered different buckets than
        the timed call's)."""
        rng = (self._rng if seed is None
               else np.random.default_rng((self._seed, int(seed))))
        return rng.choice(self.n_nodes, size=n_samples, p=self.prob)

    def log_prob(self, batch_n_nodes: np.ndarray) -> np.ndarray:
        lookup = {int(n): i for i, n in enumerate(self.n_nodes)}
        idx = np.array([lookup[int(n)] for n in batch_n_nodes])
        return np.log(self.prob + 1e-30)[idx]


def get_node_dist(dataset_info: dict, seed: int = 0) -> DistributionNodes:
    return DistributionNodes(dataset_info["train_n_nodes"], seed=seed)
