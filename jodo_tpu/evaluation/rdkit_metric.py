"""RDKit-based validity/complete/unique/novelty metrics (gated).

Mirrors eval_rdmol (reference evaluation/rdkit_metric.py:86-129). Without
RDKit the sanitisation-based metrics cannot be computed and are reported
as None (the stability metrics above are RDKit-free).
"""

from __future__ import annotations

import copy
from typing import List, Optional

import numpy as np

try:
    from rdkit import Chem
    from rdkit.Chem import AllChem

    HAS_RDKIT = True
except ImportError:
    HAS_RDKIT = False

__all__ = ["mol2smiles", "eval_rdmol", "get_rdkit_rmsd"]


def mol2smiles(mol):
    try:
        Chem.SanitizeMol(mol)
    except ValueError:
        return None
    return Chem.MolToSmiles(mol)


def eval_rdmol(rd_mols: List, train_smiles: Optional[List[str]] = None) -> dict:
    if not HAS_RDKIT or any(m is None for m in rd_mols):
        return dict(Validity=None, Complete=None, Unique=None, Novelty=None)

    valid_smiles = []
    complete_n = 0
    for mol in rd_mols:
        mol = copy.deepcopy(mol)
        smiles = mol2smiles(mol)
        if smiles is not None:
            try:
                mol_frags = Chem.rdmolops.GetMolFrags(mol, asMols=True)
            except Exception:
                continue
            if len(mol_frags) == 1:
                complete_n += 1
            largest = max(mol_frags, default=mol, key=lambda m: m.GetNumAtoms())
            valid_smiles.append(mol2smiles(largest))

    validity = len(valid_smiles) / len(rd_mols)
    complete = complete_n / len(rd_mols)
    unique = len(set(valid_smiles)) / len(rd_mols) if validity > 0 else 0

    novelty = -1
    if train_smiles is not None:
        gen_set = set(valid_smiles) - {None}
        train_set = set(train_smiles) - {None}
        novelty = len(gen_set - train_set) / len(rd_mols)

    return dict(Validity=validity, Complete=complete, Unique=unique, Novelty=novelty)


def get_rdkit_rmsd(mols, n_conf: int = 32, random_seed: int = 42,
                   num_workers: int = 16) -> np.ndarray:
    """Lowest RMSD between each generated conformer and RDKit-embedded
    conformers (reference evaluation/rdkit_metric.py:132-164)."""
    if not HAS_RDKIT:
        raise ImportError("get_rdkit_rmsd requires rdkit")
    lowest = []
    for mol in mols:
        mol_3d = copy.deepcopy(mol)
        try:
            Chem.SanitizeMol(mol_3d)
        except Exception:
            continue
        conf_ids = AllChem.EmbedMultipleConfs(
            mol_3d, n_conf, randomSeed=random_seed, clearConfs=True,
            numThreads=num_workers,
        )
        try:
            AllChem.MMFFOptimizeMoleculeConfs(mol_3d, numThreads=num_workers)
        except Exception:
            continue
        rmsds = []
        for cid in conf_ids:
            try:
                rmsds.append(Chem.rdMolAlign.GetBestRMS(mol, mol_3d, refId=cid))
            except Exception:
                continue
        if rmsds:
            lowest.append(min(rmsds))
    return np.asarray(lowest)
