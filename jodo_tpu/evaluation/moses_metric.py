"""MOSES / FCD metric wrappers (dependency-gated).

The reference computes FCD, SNN, Frag, Scaf, IntDiv, Filters and property
means through `moses` + `fcd_torch` (evaluation/mose_metric.py). Both are
heavyweight host-side dependencies with pretrained ChemNet weights; when
absent, these functions return None-valued dicts so pipelines keep running
and log 'n/a' (every RDKit-free metric still reports real numbers).
"""

from __future__ import annotations

from typing import List, Optional

try:
    from rdkit import Chem

    HAS_RDKIT = True
except ImportError:
    HAS_RDKIT = False

try:
    import moses

    HAS_MOSES = True
except ImportError:
    HAS_MOSES = False

try:
    from fcd_torch import FCD

    HAS_FCD = True
except ImportError:
    HAS_FCD = False

__all__ = ["get_smiles_list", "get_moses_metrics", "get_fcd_metric"]

MOSES_KEYS = ["FCD", "SNN", "Frag", "Scaf", "IntDiv", "Filters",
              "QED", "SA", "logP", "weight"]


def get_smiles_list(rd_mols) -> List[str]:
    smiles = []
    for mol in rd_mols:
        if mol is None:
            continue
        try:
            Chem.SanitizeMol(mol)
            s = Chem.MolToSmiles(mol)
        except Exception:
            continue
        if s is not None:
            smiles.append(s)
    return smiles


def get_moses_metrics(test_mols, n_jobs: int = 1, device: str = "cpu",
                      batch_size: int = 512):
    """Returns metric_fn(gen_rd_mols) -> dict of MOSES metrics."""
    if not (HAS_RDKIT and HAS_MOSES):
        def unavailable(gen_mols):
            return {k: None for k in MOSES_KEYS}

        return unavailable

    test_smiles = get_smiles_list(test_mols)

    def metric_fn(gen_mols):
        gen_smiles = get_smiles_list(gen_mols)
        return moses.get_all_metrics(
            gen_smiles, test=test_smiles, n_jobs=n_jobs, device=device,
            batch_size=batch_size,
        )

    return metric_fn


def get_fcd_metric(test_mols, n_jobs: int = 1, device: str = "cpu",
                   batch_size: int = 512):
    """Returns metric_fn(gen_rd_mols) -> {'FCD': value} (ChemNet Frechet
    distance; needs fcd_torch weights)."""
    if not (HAS_RDKIT and HAS_FCD):
        def unavailable(gen_mols):
            return {"FCD": None}

        return unavailable

    fcd = FCD(device=device, n_jobs=n_jobs, batch_size=batch_size)
    test_smiles = get_smiles_list(test_mols)
    pref = fcd.precalc(test_smiles)

    def metric_fn(gen_mols):
        gen_smiles = get_smiles_list(gen_mols)
        return {"FCD": fcd(gen=gen_smiles, pref=pref)}

    return metric_fn
