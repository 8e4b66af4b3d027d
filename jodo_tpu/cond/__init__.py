from .property_distribution import DistributionProperty, compute_mean_mad
from .classifier import make_classifier_fn, load_torch_egnn_params

__all__ = [
    "DistributionProperty",
    "compute_mean_mad",
    "make_classifier_fn",
    "load_torch_egnn_params",
]
