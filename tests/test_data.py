"""Data pipeline: containers, collation, loaders, batch prep, splits."""

import numpy as np
import jax.numpy as jnp

from jodo_tpu.configs import get_config, pad_nodes
from jodo_tpu.data import (
    BatchLoader,
    collate_batch,
    get_dataset,
    make_loader,
    prepare_graph_batch,
    split_indices,
    synthetic_dataset,
)
from jodo_tpu.data.core import MolData
from jodo_tpu.ops import DataScaler


def test_moldata_roundtrip():
    mols = [
        dict(atom_type=[0, 1, 2], fc=[0, 1, -1], pos=np.eye(3, 3),
             bond_src=[0, 1, 1, 2], bond_dst=[1, 0, 2, 1], bond_type=[1, 1, 2, 2],
             y=np.arange(3)),
        dict(atom_type=[3, 4], fc=[0, 0], pos=np.zeros((2, 3)),
             bond_src=[0, 1], bond_dst=[1, 0], bond_type=[3, 3], y=np.ones(3)),
    ]
    from jodo_tpu.data.datasets_info import QM9_WITH_H

    data = MolData.from_molecules(mols, QM9_WITH_H)
    assert len(data) == 2
    assert data.n_nodes.tolist() == [3, 2]
    sub = data.select(np.asarray([1]))
    assert len(sub) == 1
    assert sub.atom_type.tolist() == [3, 4]
    assert sub.bond_type.tolist() == [3, 3]


def test_collate_edge_com_encoding():
    mols = [
        dict(atom_type=[1, 1, 3], fc=[0, 0, -1], pos=np.eye(3, 3),
             bond_src=[0, 1, 1, 2], bond_dst=[1, 0, 2, 1],
             bond_type=[2, 2, 4, 4], y=None),
    ]
    from jodo_tpu.data.datasets_info import QM9_WITH_H

    data = MolData.from_molecules(mols, QM9_WITH_H)
    b = collate_batch(data, np.asarray([0]), pad_n=5, num_atom_types=5,
                      compress_edge=True, include_aromatic=True)
    e = b["edge_one_hot"][0]
    # double bond 0-1: exist=1, order=2/3, aromatic=0
    assert e[0, 1, 0] == 1.0
    np.testing.assert_allclose(e[0, 1, 1], 2 / 3)
    assert e[0, 1, 2] == 0.0
    # aromatic bond 1-2: exist=1, order=0, aromatic=1
    assert e[1, 2, 0] == 1.0 and e[1, 2, 1] == 0.0 and e[1, 2, 2] == 1.0
    # symmetry and padding
    np.testing.assert_array_equal(e, np.swapaxes(e, 0, 1))
    assert e[3:].sum() == 0
    # masks
    assert b["node_mask"][0].tolist() == [1, 1, 1, 0, 0]
    assert b["edge_mask"][0, 0, 0] == 0
    # one-hot atoms
    assert b["atom_one_hot"][0, 0, 1] == 1 and b["atom_one_hot"][0, 2, 3] == 1
    assert b["formal_charges"][0, 2, 0] == -1


def test_collate_onehot_encoding():
    mols = [
        dict(atom_type=[0, 1], fc=[0, 0], pos=np.zeros((2, 3)),
             bond_src=[0, 1], bond_dst=[1, 0], bond_type=[3, 3], y=None),
    ]
    from jodo_tpu.data.datasets_info import QM9_WITH_H

    data = MolData.from_molecules(mols, QM9_WITH_H)
    b = collate_batch(data, np.asarray([0]), pad_n=4, num_atom_types=5,
                      compress_edge=False, bond_types=4)
    e = b["edge_one_hot"][0]
    assert e.shape[-1] == 3
    assert e[0, 1, 2] == 1.0  # triple bond -> channel 2


def test_loader_and_prepare():
    data = synthetic_dataset("qm9_with_h", num_mols=64, seed=1)
    loader = BatchLoader(data, np.arange(64), batch_size=16, pad_n=32,
                         num_atom_types=5)
    batches = list(loader.epoch())
    assert len(batches) == 4
    batch = batches[0]
    assert batch["positions"].shape == (16, 32, 3)
    scaler = DataScaler(1, 4, 4, 1, centered=True)
    prepared = prepare_graph_batch(
        {k: jnp.asarray(v) for k, v in batch.items()}, scaler
    )
    assert prepared["xh"].shape == (16, 32, 9)
    assert prepared["edge_x"].shape == (16, 32, 32, 2)
    # CoM removed
    com = np.asarray(
        jnp.sum(prepared["xh"][:, :, :3] * prepared["node_mask"][..., None], axis=1)
    )
    np.testing.assert_allclose(com, 0, atol=1e-4)


def test_infinite_loader():
    data = synthetic_dataset("qm9_with_h", num_mols=32, seed=2)
    loader = BatchLoader(data, np.arange(32), batch_size=16, pad_n=32,
                         num_atom_types=5)
    it = loader.infinite()
    for _ in range(5):
        b = next(it)
        assert b["node_mask"].shape == (16, 32)
    it.close()


def test_compact_collate_decode_exact():
    """collate_batch_compact + on-device decode == the dense collate,
    for both edge encodings and with/without aromatic channel."""
    import jax

    from jodo_tpu.data import collate_batch_compact, decode_compact_batch
    from jodo_tpu.data.datasets_info import QM9_WITH_H

    rng = np.random.default_rng(7)
    mols = []
    for _ in range(12):
        n = int(rng.integers(2, 9))
        at = rng.integers(0, 5, n)
        fc = rng.integers(-1, 2, n)
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        src, dst, bt = [], [], []
        for i in range(n - 1):  # chain + occasional aromatic ring bond
            t = int(rng.integers(1, 5))
            src += [i, i + 1]
            dst += [i + 1, i]
            bt += [t, t]
        mols.append(dict(atom_type=at, fc=fc, pos=pos, bond_src=src,
                         bond_dst=dst, bond_type=bt, y=rng.normal(size=2)))
    data = MolData.from_molecules(mols, QM9_WITH_H)
    idx = np.arange(12)
    props = rng.normal(size=(12, 1))

    for compress, aromatic in [(True, False), (True, True), (False, False)]:
        dense = collate_batch(
            data, idx, pad_n=12, num_atom_types=5, compress_edge=compress,
            include_aromatic=aromatic, bond_types=5,
            property_values=props,
        )
        compact = collate_batch_compact(data, idx, pad_n=12,
                                        property_values=props)
        decoded = jax.jit(lambda r: decode_compact_batch(
            r, 5, compress, aromatic, 5))(
            {k: jnp.asarray(v) for k, v in compact.items()})
        assert set(decoded) == set(dense)
        for k in dense:
            np.testing.assert_allclose(
                np.asarray(decoded[k]), dense[k], atol=1e-7, err_msg=k)


def test_compact_pack_fast_path_exact():
    """The pre-tensorised pack fast path returns byte-identical batches to
    the per-molecule loop, for shuffled subsets and with properties."""
    from jodo_tpu.data import collate_batch_compact
    from jodo_tpu.data.core import _collate_compact_loop, _compact_pack
    from jodo_tpu.data.datasets_info import QM9_WITH_H

    rng = np.random.default_rng(11)
    mols = []
    for _ in range(20):
        n = int(rng.integers(2, 9))
        src, dst, bt = [], [], []
        for i in range(n - 1):
            t = int(rng.integers(1, 5))
            src += [i, i + 1]
            dst += [i + 1, i]
            bt += [t, t]
        mols.append(dict(
            atom_type=rng.integers(0, 5, n), fc=rng.integers(-1, 2, n),
            pos=rng.normal(size=(n, 3)).astype(np.float32),
            bond_src=src, bond_dst=dst, bond_type=bt,
        ))
    data = MolData.from_molecules(mols, QM9_WITH_H)
    props = rng.normal(size=(20, 1))
    idx = rng.permutation(20)[:7]

    fast = collate_batch_compact(data, idx, pad_n=12, property_values=props)
    assert _compact_pack(data, 12) is not None  # fast path engaged
    slow = _collate_compact_loop(data, idx, 12)
    slow["n_nodes"] = data.n_nodes[idx].astype(np.int32)
    slow["context"] = np.asarray(props[idx], np.float32).reshape(7, -1)
    assert set(fast) == set(slow)
    for k in fast:
        np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)

    # over-cap datasets must skip the pack (no cache attribute mutation)
    import jodo_tpu.data.core as core_mod
    old_cap = core_mod._PACK_BYTES_CAP
    try:
        core_mod._PACK_BYTES_CAP = 10
        fresh = MolData.from_molecules(mols, QM9_WITH_H)
        assert _compact_pack(fresh, 12) is None
        again = collate_batch_compact(fresh, idx, pad_n=12,
                                      property_values=props)
        for k in fast:
            np.testing.assert_array_equal(fast[k], again[k], err_msg=k)
    finally:
        core_mod._PACK_BYTES_CAP = old_cap


def test_compact_loader_through_prepare():
    """A compact BatchLoader batch flows through decode + prepare into the
    same prepared tensors as the dense path."""
    from jodo_tpu.data import decode_compact_batch

    data = synthetic_dataset("qm9_with_h", num_mols=32, seed=5)
    dense_loader = BatchLoader(data, np.arange(32), batch_size=16, pad_n=32,
                               num_atom_types=5, shuffle=False)
    compact_loader = BatchLoader(data, np.arange(32), batch_size=16,
                                 pad_n=32, num_atom_types=5, shuffle=False,
                                 compact=True)
    dense = next(iter(dense_loader.epoch()))
    compact = next(iter(compact_loader.epoch()))
    scaler = DataScaler(1, 4, 4, 1, centered=True)
    p_dense = prepare_graph_batch(
        {k: jnp.asarray(v) for k, v in dense.items()}, scaler)
    p_compact = prepare_graph_batch(
        decode_compact_batch(
            {k: jnp.asarray(v) for k, v in compact.items()}, 5),
        scaler)
    for k in p_dense:
        np.testing.assert_allclose(
            np.asarray(p_compact[k]), np.asarray(p_dense[k]), atol=1e-6,
            err_msg=k)


def test_get_dataset_synthetic_fallback():
    cfg = get_config("qm9_uncond_jodo")
    train, valid, test, info = get_dataset(cfg, synthetic_fallback=True,
                                           synthetic_size=100)
    assert len(train) + len(valid) + len(test) == 100
    assert info["name"] == "QM9"
    assert pad_nodes(cfg) == 32


def test_split_determinism():
    s1 = split_indices(1000, "GeomDrug")
    s2 = split_indices(1000, "GeomDrug")
    np.testing.assert_array_equal(s1["train"], s2["train"])
    assert len(s1["train"]) == 800 and len(s1["valid"]) == 100


def test_get_dataset_missing_raises_without_optin():
    """VERDICT r1 item 6: a missing dataset must be loud, not silent."""
    import pytest

    from jodo_tpu.configs import get_config

    cfg = get_config("qm9_uncond_jodo")
    cfg.data.root = "/nonexistent/qm9"
    with pytest.raises((FileNotFoundError, ImportError)):
        get_dataset(cfg, synthetic_fallback=False)


def test_synthetic_fallback_stamps_info():
    from jodo_tpu.configs import get_config

    cfg = get_config("qm9_uncond_jodo")
    cfg.data.root = "/nonexistent/qm9"
    out = get_dataset(cfg, synthetic_fallback=True, synthetic_size=32)
    info = out[-1]
    assert info.get("synthetic") is True


def test_epoch_include_tail_covers_every_sample():
    """VERDICT r1 weak #7: the tail partial batch must not be dropped."""
    from jodo_tpu.configs import get_config
    from jodo_tpu.data import make_loader

    cfg = get_config("qm9_uncond_jodo")
    cfg.data.root = "/nonexistent/qm9"
    train, _, _, _ = get_dataset(cfg, synthetic_fallback=True, synthetic_size=50)
    loader = make_loader(cfg, train, 32, batch_size=8, shuffle=False)
    n_default = sum(b["n_nodes"].shape[0] for b in loader.epoch())
    n_tail = sum(b["n_nodes"].shape[0] for b in loader.epoch(include_tail=True))
    assert n_default == (len(train) // 8) * 8
    assert n_tail >= len(train)
    assert n_tail % 8 == 0


def test_chemical_synthetic_dataset_is_stable_and_valid():
    """chemical_synthetic_dataset: 100% 3D-stable + graph-valid by
    construction (rejection-sampled against the metric's own bond
    tables)."""
    import numpy as np

    from jodo_tpu.data.synthetic import chemical_synthetic_dataset
    from jodo_tpu.data.datasets_info import get_dataset_info
    from jodo_tpu.evaluation.molgraph import eval_graph_mols
    from jodo_tpu.evaluation.stability import check_stability

    info = get_dataset_info("qm9_with_h")
    ds = chemical_synthetic_dataset(num_mols=16, seed=3)
    tuples = []
    for k in range(len(ds)):
        a0, a1 = ds.atom_offsets[k], ds.atom_offsets[k + 1]
        b0, b1 = ds.bond_offsets[k], ds.bond_offsets[k + 1]
        at, pos = ds.atom_type[a0:a1], ds.pos[a0:a1]
        n = a1 - a0
        bond = np.zeros((n, n), np.int64)
        bond[ds.bond_src[b0:b1], ds.bond_dst[b0:b1]] = ds.bond_type[b0:b1]
        stable, _, _, _ = check_stability(pos, at, info)
        assert stable
        tuples.append((at, bond, None))
    res = eval_graph_mols(tuples, info["atom_decoder"])
    assert res["Validity"] == 1.0
    assert res["Complete"] == 1.0
    # descriptor properties are populated and finite
    assert ds.y is not None and np.isfinite(ds.y).all()


def test_chemical_synthetic_2d_heavy_only():
    """2D chemical synthetic (ZINC/MOSES convention): heavy-atom graphs
    with implicit hydrogens, no 3D embedding, sizes drawn from the real
    train_n_nodes histogram, 100% 2D-valid by construction."""
    import numpy as np

    from jodo_tpu.data.datasets_info import get_dataset_info
    from jodo_tpu.data.synthetic import chemical_synthetic_dataset
    from jodo_tpu.evaluation import get_2d_edm_metric
    from jodo_tpu.run_lib import _dataset_tuples

    d = chemical_synthetic_dataset("zinc250k", num_mols=32, seed=0,
                                   embed_3d=False)
    sizes = np.asarray(d.n_nodes)
    assert sizes.max() <= 38 and sizes.min() >= 2
    info = dict(get_dataset_info("zinc250k"), synthetic=True)
    tuples = _dataset_tuples(d)
    _stab, rd, _mols = get_2d_edm_metric(info, tuples)(tuples)
    assert rd["Validity"] == 1.0 and rd["Complete"] == 1.0


def test_chemical_synthetic_geom_scale_sizes():
    """GEOM-profile synthetic draws sizes from the real histogram (r4
    correction: the old draw capped every molecule at <=27 atoms)."""
    import numpy as np

    from jodo_tpu.data.synthetic import chemical_synthetic_dataset

    d = chemical_synthetic_dataset("geom_with_h_1", num_mols=48, seed=1)
    sizes = np.asarray(d.n_nodes)
    assert sizes.max() > 48  # spans multiple train buckets
    assert 30 <= np.median(sizes) <= 60  # real GEOM p50 is ~44
