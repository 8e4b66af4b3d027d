from .ancestral import AncestralCoeffs, ancestral_sample, ancestral_sample_2d
from .dpm_solver import DPMSolverCoeffs, dpm_solver_sample
from .postprocess import mol_process, mol_process_2d, post_process, post_process_2d
from .generate import make_round_fn, make_sampling_fn, make_cond_sampling_eval_fn

__all__ = [
    "AncestralCoeffs",
    "ancestral_sample",
    "ancestral_sample_2d",
    "DPMSolverCoeffs",
    "dpm_solver_sample",
    "post_process",
    "post_process_2d",
    "mol_process",
    "mol_process_2d",
    "make_round_fn",
    "make_sampling_fn",
    "make_cond_sampling_eval_fn",
]
