"""First-party physchem descriptors (QED/SA/logP/TPSA/Filters) and the
Fréchet random-GNN FCD analog.

Golden values: RDKit 2023.x on the same molecules (TPSA should match
exactly — the Ertl table is implemented verbatim; logP/QED are reduced-
typing approximations checked to loose tolerances; see
evaluation/descriptors.py docstring)."""

import numpy as np
import pytest

from jodo_tpu.evaluation.descriptors import (
    MolView,
    build_sa_fragment_scores,
    count_alerts,
    crippen_logp,
    descriptor_dict,
    hba,
    hbd,
    mol_weight,
    n_aromatic_rings,
    passes_moses_filters,
    qed,
    rotatable_bonds,
    sa_score,
    tpsa,
)
from jodo_tpu.evaluation.frechet import (
    FrechetRandomGNN,
    frechet_distance,
    graph_activations,
)


def mk(symbols, bonds, fc=None):
    n = len(symbols)
    b = np.zeros((n, n), np.int64)
    for i, j, o in bonds:
        b[i, j] = b[j, i] = o
    return MolView(symbols, b, fc)


def ring(symbols, order=4, extra=()):
    n = len(symbols)
    return mk(symbols, [(i, (i + 1) % n, order) for i in range(n)]
              + list(extra))


BENZENE = ring(["C"] * 6)
PYRIDINE = ring(["C"] * 5 + ["N"])
PYRROLE = ring(["C", "C", "C", "C", "N"])
FURAN = ring(["C", "C", "C", "C", "O"])
IMIDAZOLE = ring(["C", "N", "C", "N", "C"])
ETHANOL = mk(["C", "C", "O"], [(0, 1, 1), (1, 2, 1)])
ACETIC = mk(["C", "C", "O", "O"], [(0, 1, 1), (1, 2, 2), (1, 3, 1)])
ASPIRIN = mk(
    ["C", "C", "O", "O", "C", "C", "C", "C", "C", "C", "C", "O", "O"],
    [(0, 1, 1), (1, 2, 2), (1, 3, 1), (3, 4, 1), (4, 5, 4), (5, 6, 4),
     (6, 7, 4), (7, 8, 4), (8, 9, 4), (9, 4, 4), (9, 10, 1), (10, 11, 2),
     (10, 12, 1)],
)
CAFFEINE = mk(
    ["C", "N", "C", "N", "C", "C", "C", "O", "N", "C", "C", "O", "N", "C"],
    [(0, 1, 1), (1, 2, 4), (2, 3, 4), (3, 4, 4), (4, 5, 4), (5, 1, 4),
     (5, 6, 1), (6, 7, 2), (6, 8, 1), (8, 9, 1), (8, 10, 1), (10, 11, 2),
     (10, 12, 1), (12, 13, 1), (12, 4, 1)],
)
NITROBENZENE = mk(
    ["C"] * 6 + ["N", "O", "O"],
    [(i, (i + 1) % 6, 4) for i in range(6)] + [(0, 6, 1), (6, 7, 2),
                                               (6, 8, 1)],
    fc=np.array([0] * 6 + [1, 0, -1]),
)


class TestPerception:
    def test_implicit_h(self):
        assert ETHANOL.h_count.tolist() == [3, 2, 1]
        assert BENZENE.h_count.tolist() == [1] * 6
        assert PYRROLE.h_count[4] == 1  # pyrrole NH
        assert PYRIDINE.h_count[5] == 0  # pyridine N has no H
        # imidazole: exactly one of the two N carries the H
        assert sorted(int(IMIDAZOLE.h_count[i]) for i in (1, 3)) == [0, 1]

    def test_explicit_h_molecule_gets_no_implicit(self):
        methane = mk(["C", "H", "H", "H", "H"],
                     [(0, i, 1) for i in range(1, 5)])
        assert methane.implicit_h.sum() == 0
        assert methane.h_count[0] == 4

    def test_caffeine_kekulization(self):
        # the 3-connected N1/N12 must not take a ring double bond
        assert CAFFEINE.h_count.sum() == 10
        assert abs(mol_weight(CAFFEINE) - 194.19) < 0.05

    def test_aromatic_ring_detection_kekulized_input(self):
        benzene_kek = mk(["C"] * 6, [(0, 1, 2), (1, 2, 1), (2, 3, 2),
                                     (3, 4, 1), (4, 5, 2), (5, 0, 1)])
        assert n_aromatic_rings(benzene_kek) == 1
        cyclohexane = ring(["C"] * 6, order=1)
        assert n_aromatic_rings(cyclohexane) == 0


class TestTPSA:
    """Ertl 2000 table — these match RDKit's TPSA exactly."""

    @pytest.mark.parametrize("mol,expected", [
        (BENZENE, 0.0), (PYRIDINE, 12.89), (PYRROLE, 15.79),
        (FURAN, 13.14), (IMIDAZOLE, 28.68), (ETHANOL, 20.23),
        (ACETIC, 37.30), (ASPIRIN, 63.60), (CAFFEINE, 58.44),
        (NITROBENZENE, 45.82),
    ])
    def test_golden(self, mol, expected):
        assert tpsa(mol) == pytest.approx(expected, abs=0.01)


class TestDescriptors:
    def test_mw(self):
        assert mol_weight(BENZENE) == pytest.approx(78.11, abs=0.05)
        assert mol_weight(ASPIRIN) == pytest.approx(180.16, abs=0.05)

    def test_hbond_counts(self):
        assert (hba(ETHANOL), hbd(ETHANOL)) == (1, 1)
        assert (hba(CAFFEINE), hbd(CAFFEINE)) == (3, 0)
        assert hbd(ASPIRIN) == 1

    def test_rotatable(self):
        assert rotatable_bonds(BENZENE) == 0
        assert rotatable_bonds(CAFFEINE) == 0
        assert rotatable_bonds(ASPIRIN) in (2, 3)  # RDKit variants differ

    def test_logp_tracks_rdkit(self):
        # reduced typing: tolerance 0.5 on simple molecules
        assert crippen_logp(ETHANOL) == pytest.approx(-0.0014, abs=0.2)
        assert crippen_logp(BENZENE) == pytest.approx(1.69, abs=0.3)
        assert crippen_logp(ASPIRIN) == pytest.approx(1.31, abs=0.5)
        # hydrophobicity ordering
        hexane = mk(["C"] * 6, [(i, i + 1, 1) for i in range(5)])
        assert crippen_logp(hexane) > crippen_logp(ETHANOL)

    def test_qed_range_and_ordering(self):
        for m in (BENZENE, ASPIRIN, CAFFEINE):
            assert 0.0 < qed(m) < 1.0
        # drug-like aspirin scores well above a bare ring
        assert qed(ASPIRIN) > qed(BENZENE)

    def test_alerts_and_filters(self):
        epoxide = mk(["C", "C", "O"], [(0, 1, 1), (1, 2, 1), (2, 0, 1)])
        assert count_alerts(epoxide) >= 1
        assert not passes_moses_filters(epoxide)
        assert not passes_moses_filters(NITROBENZENE)  # charged + nitro
        assert passes_moses_filters(ASPIRIN)
        assert passes_moses_filters(CAFFEINE)
        peroxide = mk(["C", "O", "O", "C"],
                      [(0, 1, 1), (1, 2, 1), (2, 3, 1)])
        assert count_alerts(peroxide) >= 1

    def test_sa_score_range_and_complexity_ordering(self):
        views = [BENZENE, ETHANOL, ASPIRIN, CAFFEINE]
        table = build_sa_fragment_scores(views)
        for m in views:
            assert 1.0 <= sa_score(m, table) <= 10.0
        # spiro/bridged cage scores harder than a plain chain
        spiro = mk(["C"] * 9,
                   [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 0, 1),
                    (4, 5, 1), (5, 6, 1), (6, 7, 1), (7, 8, 1), (8, 4, 1)])
        chain = mk(["C"] * 9, [(i, i + 1, 1) for i in range(8)])
        assert sa_score(spiro, table) > sa_score(chain, table)

    def test_descriptor_dict_complete(self):
        d = descriptor_dict(ASPIRIN)
        for k in ("MW", "logP", "HBA", "HBD", "TPSA", "RotB", "AromRings",
                  "Alerts", "QED", "SA", "Filters"):
            assert k in d


class TestFrechet:
    def _tuples(self, views):
        return [(v.symbols, v.kek + 3 * (v.arom_bond & (v.kek > 0)), v.fc)
                for v in views]

    def test_identical_distributions_near_zero(self):
        mols = [(m.symbols, m.kek, m.fc)
                for m in (BENZENE, ETHANOL, ASPIRIN, CAFFEINE, PYRIDINE,
                          FURAN)]
        act = graph_activations(mols)
        assert frechet_distance(act, act) == pytest.approx(0.0, abs=1e-3)

    def test_disjoint_distributions_positive(self):
        a = graph_activations([(m.symbols, m.kek, m.fc)
                               for m in (BENZENE, PYRIDINE, FURAN,
                                         PYRROLE)])
        chains = [mk(["C"] * k + ["O"], [(i, i + 1, 1) for i in range(k)])
                  for k in range(2, 6)]
        b = graph_activations([(m.symbols, m.kek, m.fc) for m in chains])
        assert frechet_distance(a, b) > 1.0

    def test_deterministic_across_instances(self):
        mols = [(BENZENE.symbols, BENZENE.kek, BENZENE.fc)]
        a1 = graph_activations(mols, FrechetRandomGNN())
        a2 = graph_activations(mols, FrechetRandomGNN())
        np.testing.assert_allclose(a1, a2)


class TestMetricIntegration:
    def test_moses_block_fully_populated(self):
        from jodo_tpu.data.datasets_info import QM9_WITH_H
        from jodo_tpu.evaluation.graph_metrics import get_graph_moses_metrics

        def tup(v):
            atom_enc = {s: i for i, s in
                        enumerate(QM9_WITH_H["atom_decoder"])}
            at = np.array([atom_enc[s] for s in v.symbols])
            return (None, at, v.kek, v.fc)

        test_set = [tup(v) for v in (BENZENE, ETHANOL, ACETIC, PYRIDINE,
                                     FURAN)]
        gen_set = [tup(v) for v in (BENZENE, ETHANOL, CAFFEINE)]
        fn = get_graph_moses_metrics(test_set, QM9_WITH_H["atom_decoder"])
        res = fn(gen_set)
        for k in ("FCD", "SNN", "Frag", "Scaf", "IntDiv", "Filters", "QED",
                  "SA", "logP", "weight"):
            assert res[k] is not None, k
        assert res["metric_impl"] == "molgraph"
        assert 0.0 <= res["Filters"] <= 1.0
        assert 0.0 < res["QED"] < 1.0
        assert res["FCD"] >= 0.0
