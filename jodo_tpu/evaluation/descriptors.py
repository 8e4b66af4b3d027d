"""First-party (RDKit-free) physico-chemical descriptors: QED, SA, logP,
TPSA, rotatable bonds, H-bond donors/acceptors, structural alerts, MOSES
filters.

The reference reports QED/SA/logP/weight means and the MOSES `Filters`
pass-rate through RDKit + MOSES (reference evaluation/mose_metric.py:
88-124, MeanProperty :153-155). Those libraries are unavailable in this
environment, so this module re-implements the descriptor stack directly on
the decoded molecular graphs (symbols, bond-order matrix, formal charges):

  * Kekulisation of aromatic systems by maximum matching (pyrrole-type
    lone-pair atoms are the unmatched ones), implicit-H perception from
    (element, charge) default valences — the ZINC/MOSES graphs carry
    implicit hydrogens, QM9/GEOM explicit ones.
  * Ring perception: cycle basis refined to smallest rings (SSSR-like),
    aromatic-ring detection, spiro/bridgehead/macrocycle counts.
  * TPSA — Ertl 2000 fragment contributions for N/O (RDKit's default
    excludes S/P; we match that default).
  * Crippen logP — Wildman & Crippen 1999 atomic contributions on a
    REDUCED atom-typing scheme (the published 68-type table collapsed to
    the distinctions derivable without SMARTS; values are the published
    ones, typing is coarser — absolute values track RDKit to ~±0.5 on
    drug-like molecules, trends/orderings are preserved).
  * QED — Bickerton 2012 weighted-desirability composite with the
    published ADS parameters and mean weights, over the 8 descriptors
    (MW, ALOGP, HBA, HBD, PSA, ROTB, AROM, ALERTS); the alert list is a
    ~30-pattern subset of the Brenk/MCF set implemented as graph
    predicates (no SMARTS engine), documented per-pattern below.
  * SA score — Ertl & Schuffenhauer 2009 formula with the published
    complexity penalties; the fragment-frequency score table (RDKit ships
    it as fpscores.pkl derived from PubChem, unavailable offline) is
    fitted from the evaluation's own training set via
    `build_sa_fragment_scores` (same construction: log-scaled Morgan-env
    frequencies). Scores are comparable within a run, not to RDKit's.
  * Filters — MOSES `mol_passes_filters` semantics (metrics/utils.py in
    MOSES): allowed atom set, no formal charges, no ring of size >= 8,
    no MCF/PAINS-subset alert match, valid molecule.

Every result dict from the metric layer carries metric_impl='molgraph' so
provenance is explicit. When RDKit/MOSES are installed the reference
implementations take precedence (evaluation/moses_metric.py).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from .graph_metrics import ATOMIC_MASS

__all__ = [
    "MolView",
    "tpsa",
    "crippen_logp",
    "qed",
    "sa_score",
    "build_sa_fragment_scores",
    "count_alerts",
    "passes_moses_filters",
    "descriptor_dict",
]

AROMATIC = 4

# Default valences by (element, formal charge); lists = multi-valent.
_DEFAULT_VALENCE: Dict[str, Dict[int, Tuple[int, ...]]] = {
    "H": {0: (1,)},
    "B": {0: (3,), -1: (4,)},
    "C": {0: (4,), 1: (3,), -1: (3,)},
    "N": {0: (3,), 1: (4,), -1: (2,)},
    "O": {0: (2,), 1: (3,), -1: (1,)},
    "F": {0: (1,), -1: (0,)},
    "Al": {0: (3,)},
    "Si": {0: (4,)},
    "P": {0: (3, 5), 1: (4,)},
    "S": {0: (2, 4, 6), 1: (3, 5), -1: (1,)},
    "Cl": {0: (1,), -1: (0,)},
    "As": {0: (3, 5)},
    "Se": {0: (2, 4, 6)},
    "Br": {0: (1,), -1: (0,)},
    "I": {0: (1,), -1: (0,), 1: (2,)},
    "Hg": {0: (2,)},
    "Bi": {0: (3, 5)},
}


class MolView:
    """Perceived view of a decoded molecular graph.

    Inputs may carry explicit hydrogens (QM9/GEOM) or implicit ones
    (ZINC/MOSES); aromatic bonds (order channel 4) are kekulised by
    maximum matching so every downstream descriptor sees integer bond
    orders plus an `aromatic` flag per atom/bond.
    """

    def __init__(self, symbols: Sequence[str], bond: np.ndarray,
                 fc: Optional[np.ndarray] = None):
        self.symbols = list(symbols)
        n = len(self.symbols)
        bond = np.asarray(bond).copy()
        np.fill_diagonal(bond, 0)
        self.fc = (np.asarray(fc, np.int64) if fc is not None
                   else np.zeros(n, np.int64))
        self.arom_bond = bond == AROMATIC
        self.kek = self._kekulize(bond)  # integer orders
        self.adj = self.kek > 0
        self.degree = self.adj.sum(1)
        self.heavy = np.asarray([s != "H" for s in self.symbols])
        self.heavy_degree = (self.adj & self.heavy[None, :]).sum(1)
        self.explicit_h = (self.adj & ~self.heavy[None, :]).sum(1)
        self.valence = self.kek.sum(1)
        self.implicit_h = self._implicit_h()
        self.h_count = self.explicit_h + self.implicit_h
        self.arom_atom = self.arom_bond.any(1)
        self.rings = self._smallest_rings()
        self.ring_count_per_atom = np.zeros(n, np.int64)
        self.ring_bond = np.zeros_like(self.adj)
        for r in self.rings:
            for a in r:
                self.ring_count_per_atom[a] += 1
            for a, b2 in zip(r, r[1:] + r[:1]):
                self.ring_bond[a, b2] = self.ring_bond[b2, a] = True
        self.in_ring = self.ring_count_per_atom > 0
        # aromatic rings: ring whose bonds are all aromatic-flagged, or
        # (kekulised input) alternating sp2 5/6-rings of C/N/O/S
        self.aromatic_rings = [r for r in self.rings if self._ring_aromatic(r)]
        for r in self.aromatic_rings:
            for a in r:
                self.arom_atom[a] = True
                # flag perceived (kekulised-input) aromatic bonds too
            for a, b2 in zip(r, r[1:] + r[:1]):
                self.arom_bond[a, b2] = self.arom_bond[b2, a] = True

    # -- perception ------------------------------------------------------

    def _kekulize(self, bond: np.ndarray) -> np.ndarray:
        kek = np.where(bond == AROMATIC, 1, bond).astype(np.int64)
        pairs = np.argwhere(np.triu(bond, 1) == AROMATIC)
        if len(pairs) == 0:
            return kek
        import networkx as nx

        g = nx.Graph()
        g.add_edges_from((int(i), int(j)) for i, j in pairs)
        # prefer matching carbons: N/O/S may satisfy aromaticity with a
        # lone pair (pyrrole/furan/thiophene) and need no double bond.
        # O/S strongly avoid double bonds; neutral N mildly avoids them so
        # pyrrole-type N stays unmatched (-> NH) while pyridine-type N in a
        # 6-ring still gets one (a perfect matching needs it there).
        n_conn = (bond > 0).sum(1)

        def penalty(a: int) -> float:
            s = self.symbols[a]
            if s in ("O", "S"):
                return 0.5
            if s == "N" and self.fc[a] == 0:
                # 3-connected neutral N cannot take a double bond
                # (valence 4 would need a + charge): N-methylpyrrole-type
                return 0.6 if n_conn[a] >= 3 else 0.05
            return 0.0

        for i, j in pairs:
            g[int(i)][int(j)]["weight"] = (
                2.0 - penalty(int(i)) - penalty(int(j))
            )
        matching = nx.max_weight_matching(g, maxcardinality=False)
        for i, j in matching:
            kek[i, j] = kek[j, i] = 2
        return kek

    def _implicit_h(self) -> np.ndarray:
        n = len(self.symbols)
        out = np.zeros(n, np.int64)
        if self.heavy.all() is False or (~self.heavy).any():
            # explicit-H molecule: no implicit hydrogens anywhere
            return out
        for i, s in enumerate(self.symbols):
            table = _DEFAULT_VALENCE.get(s, {})
            allowed = table.get(int(self.fc[i]))
            if not allowed:
                continue
            v = int(self.valence[i])
            for dv in allowed:
                if v <= dv:
                    out[i] = dv - v
                    break
        return out

    def _smallest_rings(self) -> List[List[int]]:
        import networkx as nx

        g = nx.Graph()
        g.add_nodes_from(range(len(self.symbols)))
        ii, jj = np.nonzero(np.triu(self.adj, 1))
        g.add_edges_from(zip(ii.tolist(), jj.tolist()))
        try:
            return [list(c) for c in nx.minimum_cycle_basis(g)]
        except Exception:
            return [list(c) for c in nx.cycle_basis(g)]

    def _ring_order(self, ring: List[int]) -> List[int]:
        """Order ring atoms along the cycle (minimum_cycle_basis returns
        sets)."""
        rset = set(ring)
        start = ring[0]
        path = [start]
        prev = -1
        while len(path) < len(ring):
            cur = path[-1]
            nxts = [j for j in np.nonzero(self.adj[cur])[0]
                    if int(j) in rset and int(j) != prev
                    and int(j) not in path]
            if not nxts:
                break
            prev = cur
            path.append(int(nxts[0]))
        return path

    def _ring_aromatic(self, ring: List[int]) -> bool:
        ring = self._ring_order(ring)
        if len(ring) < 5:
            return False
        edges = list(zip(ring, ring[1:] + ring[:1]))
        if all(self.arom_bond[a, b] for a, b in edges):
            return True
        if len(ring) not in (5, 6):
            return False
        # kekulised input: every ring atom must be sp2-capable —
        # carry a double bond, or be N/O/S donating a lone pair
        for a in ring:
            has_double = (self.kek[a] >= 2).any()
            if not has_double and self.symbols[a] not in ("N", "O", "S"):
                return False
        # Hueckel-ish: number of in-ring double bonds matches alternation
        n_double = sum(1 for a, b in edges if self.kek[a, b] == 2)
        need = len(ring) // 2
        lone = sum(1 for a in ring
                   if self.symbols[a] in ("N", "O", "S")
                   and not (self.kek[a] >= 2).any())
        return n_double + lone >= need and n_double >= need - 1

    # -- convenience -----------------------------------------------------

    def neighbors(self, i: int) -> np.ndarray:
        return np.nonzero(self.adj[i])[0]

    def heavy_neighbors(self, i: int) -> List[int]:
        return [int(j) for j in self.neighbors(i) if self.heavy[j]]

    def bond_order(self, i: int, j: int) -> int:
        return int(self.kek[i, j])

    def has_double(self, i: int) -> bool:
        return bool((self.kek[i] == 2).any())

    def has_triple(self, i: int) -> bool:
        return bool((self.kek[i] == 3).any())

    def nbr_symbols(self, i: int) -> List[str]:
        return [self.symbols[int(j)] for j in self.neighbors(i)]


# ---------------------------------------------------------------------------
# Molecular weight / H-bonding
# ---------------------------------------------------------------------------

_H_MASS = 1.008


def mol_weight(m: MolView) -> float:
    w = sum(ATOMIC_MASS.get(s, 0.0) for s in m.symbols)
    return w + float(m.implicit_h.sum()) * _H_MASS


def hba(m: MolView) -> int:
    """H-bond acceptors: N and O, excluding pyrrole-type N, amide N and
    protonated/positively charged atoms (Lipinski-flavoured count used by
    QED's HBA descriptor)."""
    count = 0
    for i, s in enumerate(m.symbols):
        if s not in ("N", "O") or m.fc[i] > 0:
            continue
        if s == "N":
            if m.arom_atom[i] and (
                    m.h_count[i] > 0
                    or int(m.heavy_degree[i] + m.h_count[i]) == 3):
                continue  # pyrrole-type N donates its lone pair to the ring
            # amide / sulfonamide N
            if any(m.symbols[j] in ("C", "S")
                   and any(m.kek[j, k] == 2 and m.symbols[k] == "O"
                           for k in m.heavy_neighbors(j))
                   for j in m.heavy_neighbors(i)):
                continue
        count += 1
    return count


def hbd(m: MolView) -> int:
    """H-bond donors: N/O/S bearing at least one hydrogen."""
    return int(sum(1 for i, s in enumerate(m.symbols)
                   if s in ("N", "O", "S") and m.h_count[i] > 0))


# ---------------------------------------------------------------------------
# TPSA (Ertl 2000; N/O contributions, RDKit default excludes S/P)
# ---------------------------------------------------------------------------


def tpsa(m: MolView) -> float:
    total = 0.0
    for i, s in enumerate(m.symbols):
        if s not in ("N", "O"):
            continue
        h = int(m.h_count[i])
        chg = int(m.fc[i])
        arom = bool(m.arom_atom[i])
        deg = int(m.heavy_degree[i]) + h  # total connections
        n_single = int((m.kek[i] == 1).sum()) + h
        n_double = int((m.kek[i] == 2).sum())
        n_triple = int((m.kek[i] == 3).sum())
        in3ring = any(len(r) == 3 for r in m.rings if i in r)
        # charge-separated nitro [N+](=O)[O-]: Ertl scores the neutral
        # N(=O)=O form (11.68 + 2x17.07 = 45.82); normalise here
        if s == "N" and chg == 1 and n_double >= 1 and any(
                m.symbols[j] == "O" and m.fc[j] == -1
                for j in m.heavy_neighbors(i)):
            chg = 0
            n_double = 2
        if s == "O" and chg == -1 and any(
                m.symbols[j] == "N" and m.fc[j] == 1
                for j in m.heavy_neighbors(i)):
            total += 17.07  # the O- of a nitro group, scored as O=
            continue

        if s == "N":
            if arom:
                if chg == 0:
                    if h >= 1:
                        total += 15.79            # [nH]
                    elif deg == 3 and n_double >= 1:
                        total += 8.39             # [n](=*)(:*):* (N-oxide-ish)
                    elif deg == 3:
                        total += 4.93             # [n](-*)(:*):*
                    else:
                        total += 12.89            # [n](:*):*
                else:
                    if h >= 1:
                        total += 14.14            # [nH+]
                    elif deg == 3 and not m.h_count[i]:
                        total += 4.10 if n_single <= 1 else 3.88
                    else:
                        total += 4.10
            elif chg == 0:
                if n_triple >= 1:
                    total += 23.79 if h == 0 else 23.79  # [N]#*
                elif n_double == 2:
                    total += 11.68                # [N](-*)(=*)=* (nitro N)
                elif n_double == 1:
                    if h == 0:
                        total += 12.36            # [N](-*)=*
                    elif h == 1:
                        total += 23.85            # [NH]=*
                    else:
                        total += 26.02
                else:
                    if h == 0:
                        total += 3.01 if in3ring else 3.24
                    elif h == 1:
                        total += 4.44 if in3ring else 12.03
                    else:
                        total += 26.02            # [NH2]-*
            elif chg > 0:
                if n_triple >= 1:
                    total += 4.36
                elif n_double >= 1:
                    total += (3.01 if h == 0 else
                              13.97 if h == 1 else 25.59)
                else:
                    total += (0.0 if h == 0 else
                              4.44 if h == 1 else
                              16.61 if h == 2 else 27.64)
            else:  # N-
                total += 12.03 + 9.0  # anionic N approx (not in Ertl table)
        else:  # O
            if arom:
                total += 13.14                    # [o]
            elif chg == -1:
                total += 23.06                    # [O-]
            elif n_double >= 1:
                total += 17.07                    # [O]=*
            elif h >= 1:
                total += 20.23                    # [OH]
            else:
                total += 12.53 if in3ring else 9.23
    return round(total, 2)


# ---------------------------------------------------------------------------
# Rotatable bonds / aromatic rings / ring complexity
# ---------------------------------------------------------------------------


def rotatable_bonds(m: MolView) -> int:
    """RDKit default RotatableBondSmarts: single, non-ring bond between two
    non-terminal atoms, neither of which is in a triple bond."""
    count = 0
    n = len(m.symbols)
    for i in range(n):
        if not m.heavy[i]:
            continue
        for j in range(i + 1, n):
            if not m.heavy[j] or m.kek[i, j] != 1 or m.ring_bond[i, j]:
                continue
            if m.heavy_degree[i] < 2 or m.heavy_degree[j] < 2:
                continue
            if m.has_triple(i) or m.has_triple(j):
                continue
            count += 1
    return count


def n_aromatic_rings(m: MolView) -> int:
    return len(m.aromatic_rings)


def _spiro_and_bridgeheads(m: MolView) -> Tuple[int, int]:
    """Spiro atoms: shared by two rings with no shared bond; bridgeheads:
    shared by >=2 rings sharing more than one atom (fused, degree>=3 in
    the ring subgraph)."""
    spiro = 0
    bridge = 0
    rings = [set(r) for r in m.rings]
    n = len(m.symbols)
    for a in range(n):
        mine = [r for r in rings if a in r]
        if len(mine) < 2:
            continue
        shared = set.union(*[r1 & r2 for r1 in mine for r2 in mine
                             if r1 is not r2])
        ring_deg = int((m.ring_bond[a]).sum())
        if shared == {a}:
            spiro += 1
        elif ring_deg >= 3:
            bridge += 1
    return spiro, bridge


# ---------------------------------------------------------------------------
# Crippen logP (Wildman & Crippen 1999, reduced atom typing)
# ---------------------------------------------------------------------------

_HETERO = ("N", "O", "S", "P", "F", "Cl", "Br", "I", "Se", "B", "Si", "As")


def _carbon_contrib(m: MolView, i: int) -> float:
    nbrs = m.heavy_neighbors(i)
    het = any(m.symbols[j] in _HETERO for j in nbrs)
    if m.arom_atom[i]:
        sub = [m.symbols[j] for j in nbrs if not m.arom_bond[i, j]]
        if not sub and m.h_count[i] > 0:
            return 0.1581          # aromatic CH               (C18)
        if any(s == "N" for s in sub):
            return 0.4619          # c attached to N           (C22)
        if any(s == "O" for s in sub):
            return 0.5437          # c attached to O           (C23)
        if any(s in ("S", "F", "Cl", "Br", "I") for s in sub):
            return 0.2713          # c attached to S/halogen   (C24-ish)
        if sub:
            return 0.1360          # c attached to C           (C21)
        return 0.2955              # aromatic bridgehead       (C19)
    if m.has_triple(i):
        return 0.1302 if not het else 0.0050
    if m.has_double(i):
        if any(m.kek[i, j] == 2 and m.symbols[j] in _HETERO for j in nbrs):
            return -0.2783         # C=O / C=N / C=S           (C5)
        return 0.1551 if not het else -0.0967  # olefinic      (C6/C26)
    # sp3
    if het:
        return -0.2035 if m.h_count[i] >= 1 else -0.2051  # C3/C4
    return 0.1441 if m.h_count[i] >= 1 else 0.0000        # C1/C2


def _nitrogen_contrib(m: MolView, i: int) -> float:
    h = int(m.h_count[i])
    if m.arom_atom[i]:
        return -0.4458             # aromatic n                (N8)
    if m.fc[i] > 0:
        return -1.950 if h > 0 else -0.3396   # N10 / N13
    if m.has_triple(i):
        return 0.01508             # nitrile                   (N9)
    nbrs = m.heavy_neighbors(i)
    amide = any(m.symbols[j] == "C"
                and any(m.kek[j, k] == 2 and m.symbols[k] in ("O", "S")
                        for k in m.heavy_neighbors(j)) for j in nbrs)
    if m.has_double(i):
        if any(m.kek[i, j] == 2 and m.symbols[j] == "O" for j in nbrs):
            return 0.08130         # nitro-type N (NS fallback value)
        return -0.3239             # imine                     (N11)
    if amide:
        return 0.08387 if h == 2 else -0.2541 if h == 1 else -0.3187
    arom_attached = any(m.arom_atom[j] for j in nbrs)
    if h >= 2:
        return -1.0270 if arom_attached else -1.0190  # N3 / N1
    if h == 1:
        return -0.5188 if arom_attached else -0.7096  # N4 / N2
    return -0.3187                 # tertiary amine            (N7)


def _oxygen_contrib(m: MolView, i: int) -> float:
    if m.arom_atom[i]:
        return 0.1552              # aromatic o                (O1)
    if m.fc[i] < 0:
        nbrs = m.heavy_neighbors(i)
        acid = any(m.symbols[j] in ("C", "S", "P", "N")
                   and any(m.kek[j, k] == 2 and m.symbols[k] == "O"
                           for k in m.heavy_neighbors(j)) for j in nbrs)
        return -1.326 if acid else -0.3514
    if m.has_double(i):
        j = int(np.nonzero(m.kek[i] == 2)[0][0])
        if m.symbols[j] == "C":
            others = [m.symbols[k] for k in m.heavy_neighbors(j) if k != i]
            if any(s in ("N", "O") for s in others):
                return 0.4833      # ester / amide carbonyl O  (O11-ish)
            if any(m.arom_atom[k] for k in m.heavy_neighbors(j)):
                return 0.1129      # aryl carbonyl             (O10)
            return -0.1526         # alkyl carbonyl            (O9)
        return -0.0057             # O=S / O=N / O=P           (O2? reduced)
    if m.h_count[i] >= 1:
        # carboxylic/sulfonic/phosphonic acid -OH is its own (very
        # hydrophilic) type O12 in Wildman-Crippen
        if any(m.symbols[j] in ("C", "S", "P")
               and any(m.kek[j, k] == 2 and m.symbols[k] == "O"
                       for k in m.heavy_neighbors(j))
               for j in m.heavy_neighbors(i)):
            return -1.326          # acid O                    (O12)
        return -0.2893             # hydroxyl                  (O2-ish)
    nbrs = m.heavy_neighbors(i)
    if any(m.arom_atom[j] for j in nbrs):
        return 0.0579              # aryl ether
    return -0.0684                 # alkyl ether               (O3)


_SIMPLE_LOGP = {
    "F": 0.4202, "Cl": 0.6895, "Br": 0.8456, "I": 0.8857,
    "P": 0.8612, "B": -0.3187, "Si": 0.0, "Se": 0.6482,
    "Al": 0.0, "As": 0.0, "Hg": 0.0, "Bi": 0.0,
}


def crippen_logp(m: MolView) -> float:
    total = 0.0
    for i, s in enumerate(m.symbols):
        if s == "H":
            continue  # explicit H folded into the implicit count below
        if s == "C":
            c = _carbon_contrib(m, i)
        elif s == "N":
            c = _nitrogen_contrib(m, i)
        elif s == "O":
            c = _oxygen_contrib(m, i)
        elif s == "S":
            c = (0.6237 if m.arom_atom[i] else
                 -0.0024 if m.fc[i] != 0 else 0.6482)
        else:
            c = _SIMPLE_LOGP.get(s, 0.08129)
        total += c
        # hydrogens on this atom
        h = int(m.h_count[i])
        if h:
            if s == "C":
                total += 0.1230 * h      # hydrocarbon H       (H1)
            elif s == "O":
                total += -0.2677 * h     # alcohol/acid H      (H2)
            elif s == "N":
                total += 0.2142 * h      # amine H             (H3)
            else:
                total += 0.1125 * h      # HS fallback
    return round(total, 4)


# ---------------------------------------------------------------------------
# Structural alerts (Brenk/MCF-subset, graph predicates instead of SMARTS)
# ---------------------------------------------------------------------------


def _alerts(m: MolView) -> List[str]:
    hits: List[str] = []
    n = len(m.symbols)
    sym = m.symbols
    kek = m.kek
    halogens = ("F", "Cl", "Br", "I")

    def bonded(i, j):
        return m.adj[i, j]

    for i in range(n):
        s = sym[i]
        nbrs = m.heavy_neighbors(i)
        if s == "O":
            for j in nbrs:
                if sym[j] == "O":
                    hits.append("peroxide")          # [#8][#8]
                if sym[j] in halogens:
                    hits.append("O-halogen")
            if m.h_count[i] == 0 and m.fc[i] == 0 and not nbrs:
                hits.append("lone-oxygen")
        elif s == "S":
            for j in nbrs:
                if sym[j] == "S":
                    hits.append("disulfide")         # [#16][#16]
            if m.h_count[i] > 0:
                hits.append("thiol")                 # [SH]
            # sulfonyl halide S(=O)(=O)X
            if sum(1 for j in nbrs if kek[i, j] == 2 and sym[j] == "O") >= 2 \
                    and any(sym[j] in halogens for j in nbrs):
                hits.append("sulfonyl-halide")
        elif s == "N":
            for j in nbrs:
                if sym[j] == "N" and not (m.arom_atom[i] and m.arom_atom[j]):
                    if kek[i, j] == 2:
                        hits.append("azo")           # N=N
                    elif kek[i, j] == 1:
                        hits.append("hydrazine")     # N-N
                if sym[j] in halogens:
                    hits.append("N-halogen")
                if sym[j] == "S" and not m.arom_atom[j] \
                        and not any(kek[j, k] == 2 and sym[k] == "O"
                                    for k in m.heavy_neighbors(j)):
                    hits.append("N-S")               # MCF [#7][S;!sulfonyl]
            # nitro handled as alert too (Brenk)
            if sum(1 for j in nbrs if sym[j] == "O" and kek[i, j] == 2) \
                    + sum(1 for j in nbrs
                          if sym[j] == "O" and m.fc[j] < 0) >= 2:
                hits.append("nitro")
            # isocyanate / isothiocyanate N=C=O|S
            for j in nbrs:
                if sym[j] == "C" and kek[i, j] == 2:
                    if any(kek[j, k] == 2 and sym[k] in ("O", "S")
                           and k != i for k in m.heavy_neighbors(j)):
                        hits.append("iso(thio)cyanate")
            # oxime / hydrazone C=N-O / C=N-N
            if any(kek[i, j] == 2 and sym[j] == "C" for j in nbrs) and \
                    any(kek[i, j] == 1 and sym[j] in ("O", "N")
                        for j in nbrs):
                hits.append("oxime/hydrazone")
        elif s == "C":
            dbl_o = [j for j in nbrs if kek[i, j] == 2 and sym[j] == "O"]
            if dbl_o:
                # acyl halide C(=O)X
                if any(sym[j] in halogens for j in nbrs):
                    hits.append("acyl-halide")
                # aldehyde [CH](=O) on carbon
                if m.h_count[i] >= 1 and m.heavy_degree[i] <= 2 and \
                        any(sym[j] == "C" for j in nbrs):
                    hits.append("aldehyde")
                # anhydride C(=O)OC(=O)
                for j in nbrs:
                    if sym[j] == "O" and kek[i, j] == 1:
                        for k in m.heavy_neighbors(j):
                            if k != i and sym[k] == "C" and any(
                                    kek[k, l] == 2 and sym[l] == "O"
                                    for l in m.heavy_neighbors(k)):
                                hits.append("anhydride")
                # Michael acceptor C=C-C(=O)
                for j in nbrs:
                    if sym[j] == "C" and kek[i, j] == 1 and \
                            not m.arom_atom[j] and any(
                                kek[j, k] == 2 and sym[k] == "C"
                                for k in m.heavy_neighbors(j)):
                        hits.append("michael-acceptor")
            # alkyl halide on sp3 C (excluding CF3)
            hx = [j for j in nbrs if sym[j] in ("Cl", "Br", "I")]
            if hx and not m.has_double(i) and not m.has_triple(i) \
                    and not m.arom_atom[i]:
                hits.append("alkyl-halide")
            # ketene C=C=O
            if sum(1 for j in nbrs if kek[i, j] == 2) >= 2 and dbl_o:
                hits.append("ketene/cumulated")
            # carbocation / carbanion
            if m.fc[i] != 0:
                hits.append("charged-carbon")
    # three-membered heterocycles *1[O,S,N]*1
    for r in m.rings:
        if len(r) == 3 and any(sym[a] in ("O", "S", "N") for a in r):
            hits.append("3ring-heterocycle")
        if len(r) == 4 and any(sym[a] in ("O", "S") for a in r):
            hits.append("4ring-heterocycle")
    # terminal alkyne / any C#C (MCF)
    ii, jj = np.nonzero(np.triu(kek == 3, 1))
    for a, b2 in zip(ii, jj):
        if sym[int(a)] == "C" and sym[int(b2)] == "C":
            hits.append("alkyne")
    return hits


def count_alerts(m: MolView) -> int:
    return len(set(_alerts(m)))


# ---------------------------------------------------------------------------
# QED (Bickerton et al. 2012) — published ADS parameters + mean weights
# ---------------------------------------------------------------------------

_ADS = {
    "MW":     (2.817065973, 392.5754953, 290.7489764, 2.419764353,
               49.22325677, 65.37051707, 104.9805561),
    "ALOGP":  (3.172690585, 137.8624751, 2.534937431, 4.581497897,
               0.822739154, 0.576295591, 131.3186604),
    "HBA":    (2.948620388, 160.4605972, 3.615294657, 4.435986202,
               0.290141953, 1.300669958, 148.7763046),
    "HBD":    (1.618662227, 1010.051101, 0.985094388, 0.000000001,
               0.713820843, 0.920922555, 258.1632616),
    "PSA":    (1.876861559, 125.2232657, 62.90773554, 87.83366614,
               12.01999824, 28.51324732, 104.5686167),
    "ROTB":   (0.010000000, 272.4121427, 2.558379970, 1.565547684,
               1.271567166, 2.758063707, 105.4420403),
    "AROM":   (3.217788970, 957.7374108, 2.274627939, 0.000000001,
               1.317690384, 0.375760881, 312.3372610),
    "ALERTS": (0.010000000, 1199.094025, -0.09002883, 0.000000001,
               0.185904477, 0.875193782, 417.7253140),
}

_QED_WEIGHTS = {
    "MW": 0.66, "ALOGP": 0.46, "HBA": 0.05, "HBD": 0.61,
    "PSA": 0.06, "ROTB": 0.65, "AROM": 0.48, "ALERTS": 0.95,
}


def _ads(x: float, p: Tuple[float, ...]) -> float:
    a, b, c, d, e, f, dmax = p
    t1 = 1.0 + math.exp(-(x - c + d / 2.0) / e)
    t2 = 1.0 + math.exp(-(x - c - d / 2.0) / f)
    return max((a + b / t1 * (1.0 - 1.0 / t2)) / dmax, 1e-6)


def qed(m: MolView) -> float:
    vals = {
        "MW": mol_weight(m),
        "ALOGP": crippen_logp(m),
        "HBA": hba(m),
        "HBD": hbd(m),
        "PSA": tpsa(m),
        "ROTB": rotatable_bonds(m),
        "AROM": n_aromatic_rings(m),
        "ALERTS": count_alerts(m),
    }
    num = sum(_QED_WEIGHTS[k] * math.log(_ads(float(v), _ADS[k]))
              for k, v in vals.items())
    return math.exp(num / sum(_QED_WEIGHTS.values()))


# ---------------------------------------------------------------------------
# SA score (Ertl & Schuffenhauer 2009) with dataset-fitted fragment scores
# ---------------------------------------------------------------------------


def _atom_envs_for_sa(m: MolView, radius: int = 2) -> List[int]:
    """Radius-2 WL environment hash per heavy atom (the Morgan-env analog
    RDKit's sascorer uses as fragment key)."""
    import hashlib as _hl

    n = len(m.symbols)
    labels = [f"{s}|{int(c)}|{int(h)}" for s, c, h in
              zip(m.symbols, m.fc, m.h_count)]
    out_labels = list(labels)
    for _ in range(radius):
        new = []
        for i in range(n):
            env = sorted(f"{int(m.kek[i, j])}:{out_labels[int(j)]}"
                         for j in m.neighbors(i))
            new.append(_hl.blake2b(
                (out_labels[i] + "|" + ",".join(env)).encode(),
                digest_size=8).hexdigest())
        out_labels = new
    return [int(h, 16) for i, h in enumerate(out_labels) if m.heavy[i]]


def build_sa_fragment_scores(mol_views: Sequence[MolView]) -> Dict[int, float]:
    """Fit the fragment-frequency score table from a training set — the
    construction behind RDKit's fpscores.pkl (PubChem-derived there):
    common environments score high, rare ones low, on a log scale
    clipped to [-4, 4]."""
    from collections import Counter

    counts: Counter = Counter()
    for mv in mol_views:
        counts.update(_atom_envs_for_sa(mv))
    if not counts:
        return {}
    ref = float(np.percentile(list(counts.values()), 80))
    ref = max(ref, 1.0)
    return {env: float(np.clip(math.log10(c / ref) + 1.0, -4.0, 4.0))
            for env, c in counts.items()}


def sa_score(m: MolView, frag_scores: Optional[Dict[int, float]] = None) -> float:
    """1 (easy) .. 10 (hard). Ertl formula; stereo penalty omitted (no
    chirality perception on these graphs — documented approximation)."""
    envs = _atom_envs_for_sa(m)
    n_heavy = int(m.heavy.sum()) or 1
    if frag_scores:
        score1 = sum(frag_scores.get(e, -4.0) for e in envs) / len(envs) \
            if envs else 0.0
    else:
        score1 = 0.0
    size_pen = n_heavy ** 1.005 - n_heavy
    spiro, bridge = _spiro_and_bridgeheads(m)
    macro = math.log10(2) if any(len(r) > 8 for r in m.rings) else 0.0
    score2 = -size_pen - math.log10(spiro + 1) - math.log10(bridge + 1) - macro
    score3 = 0.0
    if envs and n_heavy > len(set(envs)):
        score3 = math.log(float(n_heavy) / len(set(envs))) * 0.5
    raw = score1 + score2 + score3
    mn, mx = -4.0, 2.5
    sa = 11.0 - (raw - mn + 1.0) / (mx - mn) * 9.0
    if sa > 8.0:
        sa = 8.0 + math.log(sa + 1.0 - 9.0)
    return float(np.clip(sa, 1.0, 10.0))


# ---------------------------------------------------------------------------
# MOSES filters
# ---------------------------------------------------------------------------

_MOSES_ALLOWED = {"C", "N", "S", "O", "F", "Cl", "Br", "H"}


def passes_moses_filters(m: MolView) -> bool:
    """MOSES mol_passes_filters semantics: allowed atoms, no charges,
    no ring >= 8 atoms, no MCF/PAINS-subset alert."""
    if any(s not in _MOSES_ALLOWED for s in m.symbols):
        return False
    if (m.fc != 0).any():
        return False
    if any(len(r) >= 8 for r in m.rings):
        return False
    if _alerts(m):
        return False
    return True


def descriptor_dict(m: MolView,
                    frag_scores: Optional[Dict[int, float]] = None) -> dict:
    return {
        "MW": mol_weight(m),
        "logP": crippen_logp(m),
        "HBA": hba(m),
        "HBD": hbd(m),
        "TPSA": tpsa(m),
        "RotB": rotatable_bonds(m),
        "AromRings": n_aromatic_rings(m),
        "Alerts": count_alerts(m),
        "QED": qed(m),
        "SA": sa_score(m, frag_scores),
        "Filters": passes_moses_filters(m),
    }
