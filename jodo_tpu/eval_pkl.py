"""Standalone cross-method benchmark CLI: score any pickle of molecules.

The reference's `eval_rdkit_pkl.py` is the oracle used to compare methods
(README.md:82-106): load a pickle of RDKit mols (or decoded tuples), score
it with the same stability / RDKit / MOSES / sub-geometry stack. Usage:

  python -m jodo_tpu.eval_pkl --pkl_path mols.pkl --dataset_name qm9 \
      --type 3D [--sub_geometry] [--root_path data/]

Accepts two pickle payloads:
  * a list of RDKit mols (the reference's format) — requires rdkit
  * a list of decoded tuples (pos, atom_type, edge_type, fc) — rdkit-free
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

from .data.datasets_info import get_dataset_info
from .evaluation import (
    get_2d_edm_metric,
    get_edm_metric,
    get_moses_metrics,
    get_sub_geometry_metric,
)

try:
    from rdkit import Chem, RDLogger

    RDLogger.DisableLog("rdApp.*")
    HAS_RDKIT = True
except ImportError:
    HAS_RDKIT = False


def rdmol_to_tuple(mol, dataset_info, only_2d=False):
    """RDKit mol -> decoded tuple (reference eval_rdkit_pkl.py:13-42)."""
    from rdkit.Chem.rdchem import BondType as BT

    bond_encoder = {BT.SINGLE: 1, BT.DOUBLE: 2, BT.TRIPLE: 3, BT.AROMATIC: 4}
    enc = dataset_info["atom_encoder"]
    n = mol.GetNumAtoms()
    atom_type = np.array([enc[a.GetSymbol()] for a in mol.GetAtoms()], np.int64)
    pos = None
    if not only_2d:
        pos = np.asarray(mol.GetConformer().GetPositions(), np.float64)
    edge_types = np.zeros((n, n), np.int64)
    for bond in mol.GetBonds():
        s, e = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        order = bond_encoder[bond.GetBondType()]
        edge_types[s, e] = edge_types[e, s] = order
    fc = np.array([a.GetFormalCharge() for a in mol.GetAtoms()], np.int64)
    return (pos, atom_type, edge_types, fc)


def load_samples(path, dataset_info, only_2d=False):
    with open(path, "rb") as f:
        samples = pickle.load(f)
    if not samples:
        raise ValueError("empty pickle")
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return list(samples)
    if not HAS_RDKIT:
        raise ImportError("pickle contains RDKit mols but rdkit is unavailable")
    return [rdmol_to_tuple(m, dataset_info, only_2d) for m in samples]


def main(argv=None):
    parser = argparse.ArgumentParser(description="Score a pickle of molecules")
    parser.add_argument("--pkl_path", required=True)
    parser.add_argument("--dataset_name", default="qm9",
                        choices=["qm9", "Geom_Drugs"])
    parser.add_argument("--type", default="3D", choices=["3D", "2D", "both"])
    parser.add_argument("--sub_geometry", action="store_true")
    parser.add_argument("--root_path", default="data/")
    parser.add_argument("--allow_synthetic", action="store_true",
                        help="score against the deterministic synthetic "
                        "reference set when the real dataset is absent "
                        "(matches evaluate() runs with "
                        "data.allow_synthetic=true; reference-set-dependent "
                        "metrics — novelty, SNN/Frag/Scaf, FRGD, SA's "
                        "fitted fragment table — otherwise degrade to "
                        "None/-1)")
    parser.add_argument("--synthetic_size", type=int, default=4096)
    parser.add_argument("--max_node", type=int, default=0,
                        help="override data.max_node when rebuilding the "
                        "synthetic reference set (must match the config "
                        "that produced the pickle for exact agreement)")
    args = parser.parse_args(argv)

    if args.dataset_name == "qm9":
        info = get_dataset_info("qm9_with_h")
        root = args.root_path + "QM9"
    else:
        info = get_dataset_info("geom_with_h_1")
        root = args.root_path + "geom"

    # train/test molecules for novelty / MOSES / geometry targets, when the
    # dataset is present on disk (otherwise those metrics degrade gracefully)
    train_mols = test_tuples = test_rdmols = None
    try:
        from .configs import get_config
        from .data import get_dataset
        from .run_lib import _dataset_tuples, _rdmols_or_none

        cfg = get_config("qm9_uncond_jodo" if args.dataset_name == "qm9"
                         else "geom_uncond_jodo")
        cfg.data.root = root
        if args.allow_synthetic:
            cfg.data.allow_synthetic = True
            cfg.data.synthetic_size = args.synthetic_size
            if args.max_node:
                cfg.data.max_node = args.max_node
        train_ds, _, test_ds, _ = get_dataset(
            cfg, synthetic_fallback=bool(args.allow_synthetic))
        train_mols = _dataset_tuples(train_ds)
        test_tuples = _dataset_tuples(test_ds)
        test_rdmols = _rdmols_or_none(test_ds)
    except Exception:
        pass

    samples = load_samples(args.pkl_path, info, only_2d=(args.type == "2D"))
    print(f"Loaded {len(samples)} molecules from {args.pkl_path}")
    results = {}

    from .evaluation.moses_metric import HAS_MOSES, HAS_RDKIT

    if HAS_RDKIT and HAS_MOSES:
        moses_metric = get_moses_metrics(test_rdmols or [])
        moses_on_tuples = False
    else:
        # first-party fallback (evaluation/graph_metrics.py): full MOSES
        # block incl. the FRGD FCD analog, QED/SA/logP/Filters
        from .evaluation.graph_metrics import get_graph_moses_metrics

        moses_metric = get_graph_moses_metrics(
            test_tuples or [], info["atom_decoder"])
        moses_on_tuples = True

    if args.type in ("3D", "both"):
        metric = get_edm_metric(info, train_mols)
        stab, rd, rdmols = metric(samples)
        print("Metric-3D || atom stability: %.4f, mol stability: %.4f, "
              "validity: %s, complete: %s" % (
                  stab["atom_stable"], stab["mol_stable"],
                  rd["Validity"], rd["Complete"]))
        mose_res = moses_metric(samples if moses_on_tuples else rdmols)
        print("Metric-3D || MOSES block:", mose_res)
        results["3D"] = {**stab, **rd, **mose_res}
        if args.sub_geometry and test_tuples is not None:
            geo = get_sub_geometry_metric(test_tuples, info, root)(samples)

            def _fmt(v, spec):
                # class means are None when every class was skipped
                # (empty gen/tar value sets — see compute_geo_mmd)
                return ("None" if v is None else format(v, spec))

            print("Metric-Align || Bond Length MMD: %s, Bond Angle MMD: %s,"
                  " Dihedral Angle MMD: %s" % (
                      _fmt(geo["bond_length_mean"], ".4f"),
                      _fmt(geo["bond_angle_mean"], ".4f"),
                      _fmt(geo["dihedral_angle_mean"], ".6f")))
            results["3D"].update(geo)

    if args.type in ("2D", "both"):
        metric2d = get_2d_edm_metric(info, train_mols)
        stab, rd, rdmols = metric2d(samples)
        print("Metric-2D || atom stability: %.4f, mol stability: %.4f, "
              "validity: %s, complete: %s, unique: %s, novelty: %s" % (
                  stab["atom_stable"], stab["mol_stable"], rd["Validity"],
                  rd["Complete"], rd["Unique"], rd["Novelty"]))
        mose_res = moses_metric(samples if moses_on_tuples else rdmols)
        print("Metric-2D || MOSES block:", mose_res)
        results["2D"] = {**stab, **rd, **mose_res}
    return results


if __name__ == "__main__":
    main()
