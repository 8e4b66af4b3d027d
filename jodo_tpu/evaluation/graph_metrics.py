"""First-party (RDKit/MOSES-free) distribution-similarity metrics.

Approximates the reference's MOSES metric block (evaluation/
mose_metric.py:88-124) from raw decoded graphs so RDKit-less environments
still report distribution-level numbers:

  * SNN    — mean over generated molecules of the max Tanimoto similarity
    to the test set, on Morgan-style fingerprints: per-atom iterated-WL
    environment hashes at radii 0..2 (ECFP4 analog built from (symbol,
    charge) invariants and bond orders), folded to 1024 bits.
  * IntDiv — 1 - mean pairwise Tanimoto within the generated set.
  * Frag   — cosine similarity of bond-environment frequency vectors
    (fragment analog: hash of (radius-1 label_i, order, radius-1 label_j)).
  * Scaf   — cosine similarity of scaffold frequency vectors; scaffolds by
    iterative removal of degree-1 atoms (exactly the Murcko rings+linkers
    construction), hashed canonically by WL.
  * weight — 1-Wasserstein distance between molecular-weight distributions
    (first-party atomic masses).

FCD, QED, SA, logP and Filters require ChemNet weights / RDKit descriptors
and stay None without those dependencies (documented in BASELINE.md).
All results carry metric_impl='molgraph'. These are *approximations* of
the RDKit-based originals — same constructions on the same graphs, but
fingerprint hashing differs from RDKit's, so absolute values are not
comparable across implementations (trends and orderings are).
"""

from __future__ import annotations

import hashlib
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .molgraph import wl_fingerprint

__all__ = ["get_graph_moses_metrics", "morgan_bits", "scaffold_graph"]

ATOMIC_MASS = {
    "H": 1.008, "B": 10.81, "C": 12.011, "N": 14.007, "O": 15.999,
    "F": 18.998, "Al": 26.982, "Si": 28.085, "P": 30.974, "S": 32.06,
    "Cl": 35.45, "As": 74.922, "Se": 78.971, "Br": 79.904, "I": 126.904,
    "Hg": 200.59, "Bi": 208.98,
}

N_BITS = 1024


def _h(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                          "little")


def _atom_envs(symbols, bond, fc, radius=2) -> List[List[int]]:
    """Per-atom WL environment hashes for radii 0..radius."""
    n = len(symbols)
    bond = np.asarray(bond)
    if fc is None:
        fc = np.zeros(n, np.int64)
    nbrs = [np.nonzero(bond[i] > 0)[0] for i in range(n)]
    labels = [_h(f"{s}|{int(c)}") for s, c in zip(symbols, fc)]
    per_radius = [list(labels)]
    for _ in range(radius):
        new = []
        for i in range(n):
            env = sorted(f"{int(bond[i, j])}:{labels[j]}" for j in nbrs[i])
            new.append(_h(f"{labels[i]}||{','.join(env)}"))
        labels = new
        per_radius.append(list(labels))
    return per_radius


def morgan_bits(symbols, bond, fc=None, radius=2, n_bits=N_BITS) -> np.ndarray:
    """Folded binary fingerprint (ECFP-style) as a bool [n_bits] array."""
    bits = np.zeros(n_bits, bool)
    for labels in _atom_envs(symbols, bond, fc, radius):
        for lab in labels:
            bits[lab % n_bits] = True
    return bits


def _frag_counter(symbols, bond, fc=None) -> Counter:
    """Bond-environment 'fragments': radius-1 endpoint labels + order."""
    envs = _atom_envs(symbols, bond, fc, radius=1)[1]
    bond = np.asarray(bond)
    out: Counter = Counter()
    for i, j in zip(*np.nonzero(np.triu(bond, 1))):
        a, b = sorted((envs[int(i)], envs[int(j)]))
        out[_h(f"{a}|{int(bond[i, j])}|{b}")] += 1
    return out


def scaffold_graph(symbols, bond):
    """Murcko scaffold (rings + linkers): iteratively strip degree-1 atoms.
    Returns (symbols, bond) of the scaffold; empty for acyclic graphs."""
    bond = np.asarray(bond).copy()
    keep = np.ones(len(symbols), bool)
    while True:
        deg = (bond > 0).sum(axis=1)
        leaves = keep & (deg == 1)
        if not leaves.any():
            break
        keep[leaves] = False
        bond[leaves, :] = 0
        bond[:, leaves] = 0
    # isolated leftovers (deg 0) are not scaffold atoms either
    keep &= (bond > 0).any(axis=1)
    idx = np.nonzero(keep)[0]
    return [symbols[i] for i in idx], bond[np.ix_(idx, idx)]


def _scaffold_hash(symbols, bond) -> str:
    syms, b = scaffold_graph(symbols, bond)
    if len(syms) == 0:
        return ""
    return wl_fingerprint(syms, b)


def _cos(c1: Counter, c2: Counter) -> float:
    keys = set(c1) | set(c2)
    if not keys:
        return 1.0
    v1 = np.array([c1.get(k, 0) for k in keys], np.float64)
    v2 = np.array([c2.get(k, 0) for k in keys], np.float64)
    d = np.linalg.norm(v1) * np.linalg.norm(v2)
    return float(v1 @ v2 / d) if d > 0 else 0.0


def _w1(a: np.ndarray, b: np.ndarray) -> float:
    """1-Wasserstein distance between two empirical distributions."""
    if len(a) == 0 or len(b) == 0:
        return float("nan")
    qs = np.linspace(0.0, 1.0, 256)
    return float(np.mean(np.abs(np.quantile(a, qs) - np.quantile(b, qs))))


def _tanimoto_max_mean(gen: np.ndarray, ref: np.ndarray,
                       chunk: int = 512) -> float:
    """mean_g max_r Tanimoto(g, r) over bool bit matrices."""
    gen_f = gen.astype(np.float32)
    ref_f = ref.astype(np.float32)
    gen_n = gen_f.sum(1)
    ref_n = ref_f.sum(1)
    best = np.zeros(len(gen), np.float32)
    for s in range(0, len(ref), chunk):
        r = ref_f[s : s + chunk]
        inter = gen_f @ r.T
        union = gen_n[:, None] + ref_n[None, s : s + chunk] - inter
        sim = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        best = np.maximum(best, sim.max(axis=1))
    return float(best.mean())


def _int_div(gen: np.ndarray, chunk: int = 512) -> float:
    g = gen.astype(np.float32)
    n = len(g)
    if n < 2:
        return 0.0
    counts = g.sum(1)
    total = 0.0
    for s in range(0, n, chunk):
        r = g[s : s + chunk]
        inter = g @ r.T
        union = counts[:, None] + counts[None, s : s + chunk] - inter
        total += np.where(union > 0, inter / np.maximum(union, 1), 0.0).sum()
    mean_sim = (total - n) / max(n * n - n, 1)  # exclude self-similarity 1s
    return float(1.0 - mean_sim)


def _decode(mols, atom_decoder):
    out = []
    for m in mols:
        atom_type, bond, fc = m[1], m[2], (m[3] if len(m) > 3 else None)
        out.append(([atom_decoder[int(a)] for a in np.asarray(atom_type)],
                    np.asarray(bond), fc))
    return out


def get_graph_moses_metrics(test_mols: Iterable, atom_decoder: Sequence[str],
                            max_ref: int = 5000):
    """metric_fn(gen_tuples) -> MOSES-shaped dict from decoded tuples
    (pos, atom_type, bond_matrix, fc). First-party approximations; see
    module docstring, descriptors.py (QED/SA/logP/Filters) and frechet.py
    (the FCD analog) for the exact constructions."""
    from .descriptors import (MolView, build_sa_fragment_scores,
                              crippen_logp, passes_moses_filters, qed,
                              sa_score)
    from .frechet import FrechetRandomGNN, frechet_distance, graph_activations

    test = _decode(list(test_mols)[:max_ref], atom_decoder)
    test_bits = np.stack([morgan_bits(s, b, f) for s, b, f in test]) if test \
        else np.zeros((0, N_BITS), bool)
    test_frags: Counter = Counter()
    test_scafs: Counter = Counter()
    test_mw = []
    test_views = []
    for s, b, f in test:
        test_frags.update(_frag_counter(s, b, f))
        test_scafs[_scaffold_hash(s, b)] += 1
        test_mw.append(sum(ATOMIC_MASS.get(x, 0.0) for x in s))
        test_views.append(MolView(s, b, f))
    test_mw = np.asarray(test_mw)
    # SA fragment-frequency table fitted from the test split (stands in
    # for RDKit's PubChem-derived fpscores.pkl; descriptors.py docstring)
    sa_frag_scores = build_sa_fragment_scores(test_views)
    featurizer = FrechetRandomGNN()
    test_act = graph_activations(test, featurizer) if test else None

    def metric_fn(gen_mols):
        gen = _decode(gen_mols, atom_decoder)
        if not gen:
            return {"FCD": None, "SNN": None, "Frag": None, "Scaf": None,
                    "IntDiv": None, "Filters": None, "QED": None, "SA": None,
                    "logP": None, "weight": None, "metric_impl": "molgraph"}
        bits = np.stack([morgan_bits(s, b, f) for s, b, f in gen])
        frags: Counter = Counter()
        scafs: Counter = Counter()
        mw = []
        views = []
        for s, b, f in gen:
            frags.update(_frag_counter(s, b, f))
            scafs[_scaffold_hash(s, b)] += 1
            mw.append(sum(ATOMIC_MASS.get(x, 0.0) for x in s))
            views.append(MolView(s, b, f))
        frgd = None
        if test_act is not None and len(gen) >= 2:
            gen_act = graph_activations(gen, featurizer)
            frgd = frechet_distance(gen_act, test_act)
        return {
            # Fréchet Random-GNN Distance — deterministic first-party FCD
            # analog (frechet.py; ChemNet weights unavailable, BASELINE.md)
            "FCD": frgd,
            "SNN": _tanimoto_max_mean(bits, test_bits) if len(test_bits)
            else None,
            "Frag": _cos(frags, test_frags) if test_frags else None,
            "Scaf": _cos(scafs, test_scafs) if test_scafs else None,
            "IntDiv": _int_div(bits),
            # None (not NaN) when nothing decoded, matching SNN/Frag/Scaf
            "Filters": float(np.mean([passes_moses_filters(v)
                                      for v in views])) if views else None,
            "QED": float(np.mean([qed(v) for v in views])) if views else None,
            "SA": float(np.mean([sa_score(v, sa_frag_scores)
                                 for v in views])) if views else None,
            "logP": float(np.mean([crippen_logp(v)
                                   for v in views])) if views else None,
            "weight": _w1(np.asarray(mw), test_mw) if len(test_mw) else None,
            "metric_impl": "molgraph",
        }

    return metric_fn
