"""Offline GEOM-Drugs preparation CLI (reference build_geom_dataset.py).

Reads the public GEOM `rdkit_folder` (summary_drugs.json + per-molecule
conformer pickles), keeps the lowest-energy conformer(s) per molecule, and
writes a compact NumPy .npz MolData archive — no torch_geometric needed.
The GeomDrug loader accepts both this .npz and the reference's .pt list.

  python -m jodo_tpu.data.build_geom --data_dir data/geom [--conformations 1]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import pickle

import numpy as np

from .core import MolData
from .datasets_info import GEOM_WITH_H_1


def rdmol_record(mol, types) -> dict:
    from rdkit.Chem.rdchem import BondType as BT

    bonds = {BT.SINGLE: 1, BT.DOUBLE: 2, BT.TRIPLE: 3, BT.AROMATIC: 4}
    pos = np.asarray(mol.GetConformer().GetPositions(), np.float32)
    atom_type = np.array([types[a.GetSymbol()] for a in mol.GetAtoms()], np.int16)
    fc = np.array([a.GetFormalCharge() for a in mol.GetAtoms()], np.int16)
    src, dst, bt = [], [], []
    for bond in mol.GetBonds():
        s, e = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        code = bonds[bond.GetBondType()]
        src += [s, e]
        dst += [e, s]
        bt += [code, code]
    return dict(atom_type=atom_type, fc=fc, pos=pos, bond_src=src,
                bond_dst=dst, bond_type=bt, y=None)


def extract_conformers(data_dir: str, conformations: int = 1) -> str:
    rdkit_folder = os.path.join(data_dir, "rdkit_folder")
    summary_path = os.path.join(rdkit_folder, "summary_drugs.json")
    with open(summary_path) as f:
        summ = json.load(f)

    types = GEOM_WITH_H_1["atom_encoder"]
    charge_census = collections.Counter()

    entries = []
    for smiles, meta in summ.items():
        if meta.get("uniqueconfs") is None or meta.get("pickle_path") is None:
            continue
        entries.append(meta["pickle_path"])
    print(f"Find {len(entries)} drug molecules")

    mols = []
    for pkl_path in entries:
        with open(os.path.join(rdkit_folder, pkl_path), "rb") as f:
            mol = pickle.load(f)
        conformers = mol["conformers"]
        energies = np.array([c["totalenergy"] for c in conformers])
        for idx in np.argsort(energies)[:conformations]:
            rec = rdmol_record(conformers[int(idx)]["rd_mol"], types)
            for a, c in zip(rec["atom_type"], rec["fc"]):
                if c != 0:
                    charge_census[
                        GEOM_WITH_H_1["atom_decoder"][int(a)] + str(int(c))
                    ] += 1
            mols.append(rec)

    print(dict(charge_census))
    print(f"Process {len(mols)} drug molecule conformers")
    data = MolData.from_molecules(mols, GEOM_WITH_H_1)
    out = os.path.join(data_dir, f"data_geom_drug_{conformations}.npz")
    save_moldata_npz(data, out)
    return out


def save_moldata_npz(data: MolData, path: str):
    np.savez_compressed(
        path,
        n_nodes=data.n_nodes,
        atom_type=data.atom_type,
        formal_charge=data.formal_charge,
        pos=data.pos if data.pos is not None else np.zeros((0, 3), np.float32),
        atom_offsets=data.atom_offsets,
        bond_src=data.bond_src,
        bond_dst=data.bond_dst,
        bond_type=data.bond_type,
        bond_offsets=data.bond_offsets,
        has_pos=np.asarray([data.pos is not None]),
    )


def load_moldata_npz(path: str, info: dict) -> MolData:
    z = np.load(path)
    has_pos = bool(z["has_pos"][0])
    return MolData(
        n_nodes=z["n_nodes"],
        atom_type=z["atom_type"],
        formal_charge=z["formal_charge"],
        pos=z["pos"] if has_pos else None,
        atom_offsets=z["atom_offsets"],
        bond_src=z["bond_src"],
        bond_dst=z["bond_dst"],
        bond_type=z["bond_type"],
        bond_offsets=z["bond_offsets"],
        y=None,
        info=info,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--conformations", type=int, default=1)
    parser.add_argument("--data_dir", type=str, default="data/geom/")
    args = parser.parse_args(argv)
    extract_conformers(args.data_dir, args.conformations)


if __name__ == "__main__":
    main()
