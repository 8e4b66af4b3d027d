"""Molecule grid visualisation (reference visualize.py:7-33, RDKit-gated).

The reference's check_valid branch is dead code (missing import + typo,
visualize.py:18-21); here validity filtering actually works.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

try:
    from rdkit import Chem
    from rdkit.Chem import Draw

    HAS_RDKIT = True
except ImportError:
    HAS_RDKIT = False

__all__ = ["visualize_mols"]


def visualize_mols(mols: List, sample_dir: str, config, check_valid: bool = False):
    """Save a PNG grid of sampled molecules into `sample_dir`."""
    if not HAS_RDKIT:
        logging.info("visualize_mols skipped: rdkit not available")
        return None
    n = int(config.sampling.vis_row) * int(config.sampling.vis_col)
    draw_mols = []
    for mol in mols:
        if mol is None:
            continue
        if check_valid:
            try:
                Chem.SanitizeMol(mol)
            except Exception:
                continue
        draw_mols.append(mol)
        if len(draw_mols) >= n:
            break
    if not draw_mols:
        return None
    try:
        img = Draw.MolsToGridImage(
            draw_mols, molsPerRow=int(config.sampling.vis_col),
            subImgSize=(300, 300),
        )
        os.makedirs(sample_dir, exist_ok=True)
        path = os.path.join(sample_dir, "molecules.png")
        img.save(path)
        return path
    except Exception as exc:  # drawing failures shouldn't kill training
        logging.warning("visualize_mols failed: %s", exc)
        return None
