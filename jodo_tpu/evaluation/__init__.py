from .bond_analyze import (
    ALLOWED_BONDS,
    ALLOWED_FC_BONDS,
    get_bond_order,
    geom_predictor,
    build_threshold_matrices,
    infer_bonds_dense,
)
from .stability import (
    check_stability,
    check_2d_stability,
    get_edm_metric,
    get_2d_edm_metric,
    build_rdkit_mol,
)
from .rdkit_metric import eval_rdmol, mol2smiles, get_rdkit_rmsd
from .mmd import compute_mmd
from .geometry import (
    MolGraph,
    cal_bond_distance,
    cal_bond_angle,
    cal_dihedral_angle,
    get_sub_geometry_metric,
    compute_geo_mmd,
    load_target_geometry,
)
from .moses_metric import get_moses_metrics, get_fcd_metric, get_smiles_list
