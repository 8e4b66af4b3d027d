"""Fréchet Random-Graph-Network Distance (FRGD) — first-party FCD analog.

The reference's FCD (evaluation/mose_metric.py:127-150) measures the
Fréchet distance between generated and reference molecule distributions in
the penultimate activation space of ChemNet (a pre-trained SMILES CNN).
ChemNet's weights are not obtainable in this zero-egress environment, so
this module provides the same *construction* with a different, fully
deterministic feature map: a fixed-seed randomly-weighted message-passing
network over the molecular graph (random-feature embeddings are a standard
kernel approximation; distributional distances in random-projection spaces
preserve discriminative power — see e.g. random-network FID variants).

Properties:
  * Zero dependencies beyond NumPy, no training, no weights on disk.
  * Deterministic across runs/machines (seeded PCG64 generator).
  * Same semantics as FCD: 0 for identical distributions; grows with
    distributional mismatch in atom composition, bond topology and charge
    patterns. NOT numerically comparable to ChemNet FCD values — results
    carry metric_impl='molgraph' provenance (BASELINE.md documents this).

When `fcd_torch` is installed the true ChemNet FCD is reported instead
(evaluation/moses_metric.py takes precedence).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["graph_activations", "frechet_distance", "FrechetRandomGNN"]

_VOCAB = ["H", "B", "C", "N", "O", "F", "Al", "Si", "P", "S", "Cl", "As",
          "Se", "Br", "I", "Hg", "Bi"]
_V = {s: i for i, s in enumerate(_VOCAB)}

_HIDDEN = 256
_ROUNDS = 3
_N_BOND_TYPES = 4  # single, double, triple, aromatic


def _make_weights(seed: int = 0):
    rng = np.random.default_rng(seed)
    in_dim = len(_VOCAB) + 3  # one-hot ++ (charge, degree/4, log1p(n))
    scale = 1.0 / np.sqrt(in_dim)
    w_in = rng.normal(0.0, scale, (in_dim, _HIDDEN)).astype(np.float32)
    w_self = [rng.normal(0.0, 1.0 / np.sqrt(_HIDDEN), (_HIDDEN, _HIDDEN))
              .astype(np.float32) for _ in range(_ROUNDS)]
    w_msg = [
        [rng.normal(0.0, 1.0 / np.sqrt(_HIDDEN), (_HIDDEN, _HIDDEN))
         .astype(np.float32) for _ in range(_N_BOND_TYPES)]
        for _ in range(_ROUNDS)
    ]
    return w_in, w_self, w_msg


class FrechetRandomGNN:
    """Fixed random-weight message-passing featurizer.

    activation(mol) = [mean-pool ++ max-pool] of node states after
    `_ROUNDS` rounds of x <- tanh(W_self x + sum_order W_order (A_order x)).
    """

    def __init__(self, seed: int = 0):
        self.w_in, self.w_self, self.w_msg = _make_weights(seed)

    def __call__(self, symbols: Sequence[str], bond: np.ndarray,
                 fc: Optional[np.ndarray] = None) -> np.ndarray:
        n = len(symbols)
        bond = np.asarray(bond)
        if fc is None:
            fc = np.zeros(n, np.float32)
        feat = np.zeros((n, len(_VOCAB) + 3), np.float32)
        for i, s in enumerate(symbols):
            feat[i, _V.get(s, 2)] = 1.0
        deg = (bond > 0).sum(1)
        feat[:, -3] = np.asarray(fc, np.float32)
        feat[:, -2] = deg / 4.0
        feat[:, -1] = np.log1p(float(n))
        x = np.tanh(feat @ self.w_in)
        adjs = [(bond == o + 1).astype(np.float32)
                for o in range(_N_BOND_TYPES)]
        for r in range(_ROUNDS):
            y = x @ self.w_self[r]
            for o, a in enumerate(adjs):
                if a.any():
                    y = y + (a @ x) @ self.w_msg[r][o]
            x = np.tanh(y)
        return np.concatenate([x.mean(0), x.max(0)])


def graph_activations(mols, featurizer: Optional[FrechetRandomGNN] = None
                      ) -> np.ndarray:
    """mols: iterable of (symbols, bond, fc). Returns [M, 2*HIDDEN]."""
    f = featurizer or FrechetRandomGNN()
    return np.stack([f(s, b, c) for s, b, c in mols])


def frechet_distance(act1: np.ndarray, act2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """Fréchet (2-Wasserstein between Gaussians) distance between two
    activation sets: |mu1-mu2|^2 + tr(C1 + C2 - 2 (C1^1/2 C2 C1^1/2)^1/2).

    Symmetric-eigendecomposition implementation (no scipy.sqrtm): both
    covariance square roots are computed with eigh on PSD matrices.
    """
    mu1, mu2 = act1.mean(0), act2.mean(0)
    d = mu1 - mu2
    if act1.shape[0] < 2 or act2.shape[0] < 2:
        # too few samples for a covariance: fall back to the mean term
        return float(d @ d)
    c1 = np.atleast_2d(np.cov(act1, rowvar=False))
    c2 = np.atleast_2d(np.cov(act2, rowvar=False))

    w1, v1 = np.linalg.eigh(c1 + eps * np.eye(c1.shape[0]))
    sqrt_c1 = (v1 * np.sqrt(np.maximum(w1, 0.0))) @ v1.T
    m = sqrt_c1 @ c2 @ sqrt_c1
    wm = np.linalg.eigvalsh((m + m.T) / 2.0)
    tr_sqrt = np.sqrt(np.maximum(wm, 0.0)).sum()
    return float(d @ d + np.trace(c1) + np.trace(c2) - 2.0 * tr_sqrt)
