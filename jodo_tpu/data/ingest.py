"""Dataset ingestion: raw files -> MolData.

Host-side chemistry, gated on optional dependencies:
  * QM9: gdb9 SDF + targets CSV + uncharacterized skip list
    (reference datasets/qm9_dataset.py:188-270). Parses via RDKit when
    available, else a built-in V2000 molfile reader (no sanitisation —
    matching the reference's sanitize=False supplier).
  * GEOM-Drugs: prebuilt `data_geom_drug_1.pt` list of PyG-style records
    (reference datasets/geom_dataset.py:11-55), loaded via torch.
  * ZINC250k / MOSES: SMILES CSVs, require RDKit
    (reference datasets/zinc_dataset.py, moses_dataset.py).
"""

from __future__ import annotations

import csv
import json
import os
from typing import List, Optional

import numpy as np

from .core import MolData, split_indices
from .datasets_info import get_dataset_info

try:
    from rdkit import Chem, RDLogger

    RDLogger.DisableLog("rdApp.*")
    HAS_RDKIT = True
except ImportError:
    HAS_RDKIT = False

HAR2EV = 27.211386246
KCALMOL2EV = 0.04336414
# per-column unit conversion of the 19 QM9 targets (qm9_dataset.py:25-28)
QM9_CONVERSION = np.array(
    [1.0, 1.0, HAR2EV, HAR2EV, HAR2EV, 1.0, HAR2EV, HAR2EV, HAR2EV, HAR2EV,
     HAR2EV, 1.0, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV, 1.0, 1.0, 1.0]
)
CV_ATOMREF = np.array([2.981, 2.981, 2.981, 2.981, 2.981])


# ---------------------------------------------------------------------------
# minimal V2000 SDF reader (fallback when RDKit is unavailable)
# ---------------------------------------------------------------------------

def _iter_sdf_blocks(path: str):
    block: List[str] = []
    with open(path) as f:
        for line in f:
            if line.startswith("$$$$"):
                yield block
                block = []
            else:
                block.append(line.rstrip("\n"))
    if block and any(s.strip() for s in block):
        yield block


def _parse_v2000(block: List[str]):
    counts = block[3]
    n_atoms = int(counts[0:3])
    n_bonds = int(counts[3:6])
    pos = np.zeros((n_atoms, 3), np.float32)
    symbols = []
    fc = np.zeros(n_atoms, np.int16)
    for i in range(n_atoms):
        ln = block[4 + i]
        pos[i] = [float(ln[0:10]), float(ln[10:20]), float(ln[20:30])]
        symbols.append(ln[31:34].strip())
        # molfile charge field: 0=none, 1..7 => +3..-3 (4=0 doublet radical)
        cc = int(ln[36:39]) if len(ln) >= 39 and ln[36:39].strip() else 0
        if cc:
            fc[i] = 4 - cc if cc != 4 else 0
    src, dst, bt = [], [], []
    for i in range(n_bonds):
        ln = block[4 + n_atoms + i]
        a = int(ln[0:3]) - 1
        b = int(ln[3:6]) - 1
        order = int(ln[6:9])
        src += [a, b]
        dst += [b, a]
        bt += [order, order]
    # M  CHG property lines override atom-block charges
    for ln in block[4 + n_atoms + n_bonds :]:
        if ln.startswith("M  CHG"):
            parts = ln.split()
            k = int(parts[2])
            for j in range(k):
                fc[int(parts[3 + 2 * j]) - 1] = int(parts[4 + 2 * j])
        if ln.startswith("M  END"):
            break
    return symbols, pos, fc, np.asarray(src), np.asarray(dst), np.asarray(bt)


# ---------------------------------------------------------------------------
# QM9
# ---------------------------------------------------------------------------

def load_qm9(root: str, keep_rdmols: bool = False) -> MolData:
    """Expects root/raw/{gdb9.sdf, gdb9.sdf.csv, uncharacterized.txt}."""
    info = get_dataset_info("qm9_with_h")
    raw = os.path.join(root, "raw")
    sdf_path = os.path.join(raw, "gdb9.sdf")
    csv_path = os.path.join(raw, "gdb9.sdf.csv")
    skip_path = os.path.join(raw, "uncharacterized.txt")
    if not os.path.exists(sdf_path):
        raise FileNotFoundError(
            f"QM9 raw data not found under {raw}; download gdb9.sdf, "
            "gdb9.sdf.csv and uncharacterized.txt (see reference README)"
        )

    with open(csv_path) as f:
        lines = f.read().split("\n")[1:-1]
        target = np.array(
            [[float(x) for x in ln.split(",")[1:20]] for ln in lines], np.float64
        )
    # column reorder + unit conversion (qm9_dataset.py:215-219)
    target = np.concatenate([target[:, 3:], target[:, :3]], axis=-1)
    target = target * QM9_CONVERSION[None, :]

    with open(skip_path) as f:
        skip = set(int(x.split()[0]) - 1 for x in f.read().split("\n")[9:-2])

    types = info["atom_encoder"]
    mols = []
    if HAS_RDKIT:
        from rdkit.Chem.rdchem import BondType as BT

        bond_codes = {BT.SINGLE: 1, BT.DOUBLE: 2, BT.TRIPLE: 3, BT.AROMATIC: 4}
        suppl = Chem.SDMolSupplier(sdf_path, removeHs=False, sanitize=False)
        for i, mol in enumerate(suppl):
            if i in skip or mol is None:
                continue
            n = mol.GetNumAtoms()
            pos = np.asarray(mol.GetConformer().GetPositions(), np.float32)
            atom_type = np.array(
                [types[a.GetSymbol()] for a in mol.GetAtoms()], np.int16
            )
            fc = np.array([a.GetFormalCharge() for a in mol.GetAtoms()], np.int16)
            src, dst, bt = [], [], []
            for bond in mol.GetBonds():
                a, b = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
                code = bond_codes[bond.GetBondType()]
                src += [a, b]
                dst += [b, a]
                bt += [code, code]
            mols.append(
                dict(atom_type=atom_type, fc=fc, pos=pos, bond_src=src,
                     bond_dst=dst, bond_type=bt, y=target[i],
                     rdmol=mol if keep_rdmols else None)
            )
    else:
        for i, block in enumerate(_iter_sdf_blocks(sdf_path)):
            if i in skip:
                continue
            symbols, pos, fc, src, dst, bt = _parse_v2000(block)
            atom_type = np.array([types[s] for s in symbols], np.int16)
            mols.append(
                dict(atom_type=atom_type, fc=fc, pos=pos, bond_src=src,
                     bond_dst=dst, bond_type=bt, y=target[i])
            )
    return MolData.from_molecules(mols, info, keep_rdmols=keep_rdmols)


def qm9_splits(n: int):
    return split_indices(n, "QM9", seed=0)


def qm9_cond_splits(n: int):
    """4-way split for conditional experiments: the 100k train half is
    divided into first/second 50k (reference uses a precomputed dict;
    semantics per run_lib.py:516-518 — property model trains on the second
    half)."""
    base = split_indices(n, "QM9", seed=0)
    train = base["train"]
    half = len(train) // 2
    return {
        "first_train": train[:half],
        "second_train": train[half:],
        "valid": base["valid"],
        "test": base["test"],
    }


def sub_cv_thermo(y: np.ndarray, atom_type_counts: np.ndarray) -> np.ndarray:
    """Cv with the per-atom thermal reference subtracted
    (qm9_dataset.py:332-337)."""
    return y[:, 11] - atom_type_counts @ CV_ATOMREF


def compute_property_values(data: MolData, prop_idx: int) -> np.ndarray:
    """Per-molecule raw property values with the Cv atomref correction."""
    assert data.y is not None
    if prop_idx == 11:
        counts = np.zeros((len(data), 5), np.float64)
        for i in range(len(data)):
            a0, a1 = data.atom_offsets[i], data.atom_offsets[i + 1]
            counts[i] = np.bincount(
                data.atom_type[a0:a1].astype(np.int64), minlength=5
            )[:5]
        return sub_cv_thermo(data.y, counts)
    return data.y[:, prop_idx]


def compute_mean_mad(values: np.ndarray):
    mean = float(values.mean())
    mad = float(np.abs(values - mean).mean())
    return {"mean": mean, "mad": mad}


# ---------------------------------------------------------------------------
# GEOM-Drugs
# ---------------------------------------------------------------------------

def load_geom(root: str, processed_file: str = "data_geom_drug_1.pt") -> MolData:
    """Load prebuilt GEOM data: our .npz archive or the reference's torch
    .pt list (either name is accepted; .npz preferred when both exist)."""
    info = get_dataset_info("geom_with_h_1")
    npz_path = os.path.join(root, processed_file.replace(".pt", ".npz"))
    if os.path.exists(npz_path):
        from .build_geom import load_moldata_npz

        return load_moldata_npz(npz_path, info)

    import torch

    path = os.path.join(root, processed_file)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"GEOM processed file not found: {path}; build it with "
            "`python -m jodo_tpu.data.build_geom --data_dir <rdkit_folder>`"
        )
    data_list = torch.load(path, map_location="cpu", weights_only=False)
    mols = []
    for d in data_list:
        atom_type = np.asarray(d.atom_type, np.int16)
        pos = np.asarray(d.pos, np.float32)
        fc = np.asarray(d.fc, np.int16) if hasattr(d, "fc") else np.zeros(
            len(atom_type), np.int16
        )
        ei = np.asarray(d.edge_index, np.int64)
        et = np.asarray(d.edge_type, np.int64)
        mols.append(
            dict(atom_type=atom_type, fc=fc, pos=pos, bond_src=ei[0],
                 bond_dst=ei[1], bond_type=et, y=None)
        )
    return MolData.from_molecules(mols, info)


# ---------------------------------------------------------------------------
# ZINC250k / MOSES (SMILES CSVs; need RDKit)
# ---------------------------------------------------------------------------

def _mol_from_smiles(smiles: str, kekulize: bool):
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    if kekulize:
        Chem.Kekulize(mol)
    return mol


def _smiles_records(mol, types, kekulize: bool):
    from rdkit.Chem.rdchem import BondType as BT

    bond_codes = {BT.SINGLE: 1, BT.DOUBLE: 2, BT.TRIPLE: 3, BT.AROMATIC: 4}
    atom_type = np.array([types[a.GetSymbol()] for a in mol.GetAtoms()], np.int16)
    fc = np.array([a.GetFormalCharge() for a in mol.GetAtoms()], np.int16)
    src, dst, bt = [], [], []
    for bond in mol.GetBonds():
        a, b = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        code = bond_codes[bond.GetBondType()]
        src += [a, b]
        dst += [b, a]
        bt += [code, code]
    return dict(atom_type=atom_type, fc=fc, pos=None, bond_src=src,
                bond_dst=dst, bond_type=bt, y=None)


def load_zinc250k(root: str, keep_rdmols: bool = False) -> MolData:
    """ZINC250k property CSV; kekulized bonds, fixed JSON test indices
    (reference datasets/zinc_dataset.py:19-117)."""
    if not HAS_RDKIT:
        raise ImportError("ZINC250k ingestion requires rdkit")
    info = get_dataset_info("zinc250k")
    csv_path = os.path.join(root, "raw", "250k_rndm_zinc_drugs_clean_3.csv")
    mols = []
    with open(csv_path) as f:
        reader = csv.DictReader(f)
        for row in reader:
            smiles = row["smiles"].strip()
            mol = _mol_from_smiles(smiles, kekulize=True)
            if mol is None:
                continue
            rec = _smiles_records(mol, info["atom_encoder"], kekulize=True)
            rec["rdmol"] = mol if keep_rdmols else None
            mols.append(rec)
    return MolData.from_molecules(mols, info, keep_rdmols=keep_rdmols)


def zinc_splits(root: str, n: int):
    test_idx_path = os.path.join(root, "raw", "valid_idx_zinc250k.json")
    with open(test_idx_path) as f:
        test_idx = np.asarray(json.load(f))
    mask = np.ones(n, bool)
    mask[test_idx[test_idx < n]] = False
    train = np.nonzero(mask)[0]
    return {"train": train, "valid": test_idx, "test": test_idx}


def load_moses(root: str, keep_rdmols: bool = False):
    """MOSES CSV with a SPLIT column; aromatic bonds kept
    (reference datasets/moses_dataset.py:19-107). Returns (MolData, splits)."""
    if not HAS_RDKIT:
        raise ImportError("MOSES ingestion requires rdkit")
    info = get_dataset_info("moses")
    csv_path = os.path.join(root, "raw", "dataset_v1.csv")
    mols = []
    split_names = []
    with open(csv_path) as f:
        reader = csv.DictReader(f)
        for row in reader:
            mol = _mol_from_smiles(row["SMILES"].strip(), kekulize=False)
            if mol is None:
                continue
            rec = _smiles_records(mol, info["atom_encoder"], kekulize=False)
            rec["rdmol"] = mol if keep_rdmols else None
            mols.append(rec)
            split_names.append(row["SPLIT"])
    data = MolData.from_molecules(mols, info, keep_rdmols=keep_rdmols)
    split_names = np.asarray(split_names)
    splits = {
        "train": np.nonzero(split_names == "train")[0],
        "valid": np.nonzero(split_names == "test")[0],
        "test": np.nonzero(split_names == "test")[0],
        "test_scaffolds": np.nonzero(split_names == "test_scaffolds")[0],
    }
    return data, splits
