"""First-party MOSES-style distribution metrics."""

import numpy as np
import pytest

from jodo_tpu.data.datasets_info import QM9_WITH_H
from jodo_tpu.evaluation.graph_metrics import (
    get_graph_moses_metrics,
    morgan_bits,
    scaffold_graph,
)

DEC = QM9_WITH_H["atom_decoder"]


def bond(n, pairs, order=1):
    b = np.zeros((n, n), np.int64)
    for i, j in pairs:
        b[i, j] = b[j, i] = order
    return b


def methane():
    return (None, np.array([1, 0, 0, 0, 0]),
            bond(5, [(0, i) for i in range(1, 5)]), np.zeros(5, np.int64))


def water():
    return (None, np.array([3, 0, 0]), bond(3, [(0, 1), (0, 2)]),
            np.zeros(3, np.int64))


def cyclohexane():
    # C6 ring with no H (scaffold = the ring itself)
    n = 6
    return (None, np.ones(n, np.int64),
            bond(n, [(i, (i + 1) % n) for i in range(n)]),
            np.zeros(n, np.int64))


def test_identical_sets_score_perfect():
    test = [methane(), water(), cyclohexane()]
    fn = get_graph_moses_metrics(test, DEC)
    res = fn(test)
    assert res["SNN"] == pytest.approx(1.0)
    assert res["Frag"] == pytest.approx(1.0)
    assert res["Scaf"] == pytest.approx(1.0)
    assert res["weight"] == pytest.approx(0.0, abs=1e-9)
    assert res["metric_impl"] == "molgraph"


def test_disjoint_sets_score_low():
    fn = get_graph_moses_metrics([methane()], DEC)
    res = fn([water()])
    assert res["SNN"] < 0.5
    assert res["weight"] > 1.0  # CH4 16 vs H2O 18


def test_intdiv_zero_for_copies_positive_for_mixture():
    fn = get_graph_moses_metrics([methane()], DEC)
    same = fn([methane(), methane()])
    mixed = fn([methane(), water()])
    assert same["IntDiv"] == pytest.approx(0.0, abs=1e-9)
    assert mixed["IntDiv"] > 0.1


def test_scaffold_extraction():
    _, at, b, _ = cyclohexane()
    syms, sb = scaffold_graph([DEC[a] for a in at], b)
    assert len(syms) == 6  # the ring survives
    _, at2, b2, _ = methane()
    syms2, _ = scaffold_graph([DEC[a] for a in at2], b2)
    assert len(syms2) == 0  # acyclic -> empty scaffold


def test_morgan_bits_permutation_invariant():
    _, at, b, fc = methane()
    perm = np.array([4, 2, 0, 1, 3])
    b1 = morgan_bits([DEC[a] for a in at], b, fc)
    b2 = morgan_bits([DEC[a] for a in at[perm]], b[np.ix_(perm, perm)],
                     fc[perm])
    assert (b1 == b2).all()
