"""Empirical bond-length thresholds and valence tables.

Data from the public bond-length references (wiredchemist.com /
chemistry-reference.com), identical to the tables the EDM line of work uses
(reference evaluation/bond_analyze.py) — these constants ARE the metric, so
they must match exactly for score parity. The order predictor is also
exposed as a vectorised NumPy form for whole-molecule distance matrices.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

# single-bond lengths in pm
BONDS1: Dict[str, Dict[str, int]] = {
    "H": {"H": 74, "C": 109, "N": 101, "O": 96, "F": 92, "B": 119, "Si": 148,
          "P": 144, "As": 152, "S": 134, "Cl": 127, "Br": 141, "I": 161},
    "C": {"H": 109, "C": 154, "N": 147, "O": 143, "F": 135, "Si": 185,
          "P": 184, "S": 182, "Cl": 177, "Br": 194, "I": 214},
    "N": {"H": 101, "C": 147, "N": 145, "O": 140, "F": 136, "Cl": 175,
          "Br": 214, "S": 168, "I": 222, "P": 177},
    "O": {"H": 96, "C": 143, "N": 140, "O": 148, "F": 142, "Br": 172,
          "S": 151, "P": 163, "Si": 163, "Cl": 164, "I": 194},
    "F": {"H": 92, "C": 135, "N": 136, "O": 142, "F": 142, "S": 158,
          "Si": 160, "Cl": 166, "Br": 178, "P": 156, "I": 187},
    "B": {"H": 119, "Cl": 175},
    "Si": {"Si": 233, "H": 148, "C": 185, "O": 163, "S": 200, "F": 160,
           "Cl": 202, "Br": 215, "I": 243},
    "Cl": {"Cl": 199, "H": 127, "C": 177, "N": 175, "O": 164, "P": 203,
           "S": 207, "B": 175, "Si": 202, "F": 166, "Br": 214},
    "S": {"H": 134, "C": 182, "N": 168, "O": 151, "S": 204, "F": 158,
          "Cl": 207, "Br": 225, "Si": 200, "P": 210, "I": 234},
    "Br": {"Br": 228, "H": 141, "C": 194, "O": 172, "N": 214, "Si": 215,
           "S": 225, "F": 178, "Cl": 214, "P": 222},
    "P": {"P": 221, "H": 144, "C": 184, "O": 163, "Cl": 203, "S": 210,
          "F": 156, "N": 177, "Br": 222},
    "I": {"H": 161, "C": 214, "Si": 243, "N": 222, "O": 194, "S": 234,
          "F": 187, "I": 266},
    "As": {"H": 152},
}

BONDS2: Dict[str, Dict[str, int]] = {
    "C": {"C": 134, "N": 129, "O": 120, "S": 160},
    "N": {"C": 129, "N": 125, "O": 121},
    "O": {"C": 120, "N": 121, "O": 121, "P": 150},
    "P": {"O": 150, "S": 186},
    "S": {"P": 186},
}

BONDS3: Dict[str, Dict[str, int]] = {
    "C": {"C": 120, "N": 116, "O": 113},
    "N": {"C": 116, "N": 110},
    "O": {"C": 113},
}

MARGIN1, MARGIN2, MARGIN3 = 10, 5, 3

ALLOWED_BONDS = {
    "H": 1, "C": 4, "N": 3, "O": 2, "F": 1, "B": 3, "Al": 3, "Si": 4,
    "P": [3, 5], "S": 4, "Cl": 1, "As": 3, "Br": 1, "I": 1, "Hg": [1, 2],
    "Bi": [3, 5],
}

ALLOWED_FC_BONDS = {
    "H": {0: 1, 1: 0, -1: 0},
    "C": {0: [3, 4], 1: 3, -1: 3},
    "N": {0: [2, 3], 1: [2, 3, 4], -1: 2},
    "O": {0: 2, 1: 3, -1: 1},
    "F": {0: 1, -1: 0},
    "B": 3, "Al": 3, "Si": 4,
    "P": {0: [3, 5], 1: 4},
    "S": {0: [2, 6], 1: [2, 3], 2: 4, 3: 5, -1: 3},
    "Cl": 1, "As": 3,
    "Br": {0: 1, 1: 2}, "I": 1, "Hg": [1, 2], "Bi": [3, 5], "Se": [2, 4, 6],
}


def get_bond_order(atom1: str, atom2: str, distance: float,
                   check_exists: bool = False) -> int:
    """Infer bond order from interatomic distance (Angstrom).

    Margins tuned to maximise stability of true QM9 samples
    (reference evaluation/bond_analyze.py:108-133)."""
    distance = 100 * distance  # A -> pm
    if check_exists:
        if atom1 not in BONDS1 or atom2 not in BONDS1[atom1]:
            return 0
    if distance < BONDS1[atom1][atom2] + MARGIN1:
        if atom1 in BONDS2 and atom2 in BONDS2[atom1]:
            if distance < BONDS2[atom1][atom2] + MARGIN2:
                if atom1 in BONDS3 and atom2 in BONDS3[atom1]:
                    if distance < BONDS3[atom1][atom2] + MARGIN3:
                        return 3
                return 2
        return 1
    return 0


def geom_predictor(pair, length: float, limit_bonds_to_one: bool = False) -> int:
    """GEOM-style predictor: pairs without tabulated length -> no bond
    (reference evaluation/bond_analyze.py:142-150)."""
    order = get_bond_order(pair[0], pair[1], length, check_exists=True)
    if limit_bonds_to_one:
        return 1 if order > 0 else 0
    return order


def build_threshold_matrices(atom_decoder):
    """Vectorised lookup: [T, T] threshold matrices (pm) for orders 1/2/3,
    with +margins applied; -inf where no table entry (=> no bond)."""
    t = len(atom_decoder)
    thr1 = np.full((t, t), -np.inf)
    thr2 = np.full((t, t), -np.inf)
    thr3 = np.full((t, t), -np.inf)
    for i, a in enumerate(atom_decoder):
        for j, b in enumerate(atom_decoder):
            if a in BONDS1 and b in BONDS1[a]:
                thr1[i, j] = BONDS1[a][b] + MARGIN1
            if a in BONDS2 and b in BONDS2[a]:
                thr2[i, j] = BONDS2[a][b] + MARGIN2
            if a in BONDS3 and b in BONDS3[a]:
                thr3[i, j] = BONDS3[a][b] + MARGIN3
    return thr1, thr2, thr3


def infer_bonds_dense(pos: np.ndarray, atom_type: np.ndarray, thresholds):
    """Vectorised bond-order inference for one molecule.

    pos [n,3] Angstrom, atom_type [n] ints. Returns order matrix [n,n]
    (symmetric, zero diagonal). Equivalent to looping get_bond_order over
    all pairs but O(n^2) vectorised.
    """
    thr1, thr2, thr3 = thresholds
    d = np.sqrt(((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)) * 100.0
    t1 = thr1[atom_type[:, None], atom_type[None, :]]
    t2 = thr2[atom_type[:, None], atom_type[None, :]]
    t3 = thr3[atom_type[:, None], atom_type[None, :]]
    order = np.zeros(d.shape, np.int64)
    order[d < t1] = 1
    order[(d < t2) & (d < t1)] = 2
    order[(d < t3) & (d < t2) & (d < t1)] = 3
    np.fill_diagonal(order, 0)
    return order
