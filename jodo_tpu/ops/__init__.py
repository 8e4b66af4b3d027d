from .masks import (
    node_mask_from_counts,
    edge_mask_from_node_mask,
    masks_from_counts,
    remove_mean_with_mask,
    masked_mean_zero_error,
)
from .noise import (
    gaussian_with_mask,
    com_free_gaussian,
    combined_position_feature_noise,
    symmetric_edge_noise,
)
from .kabsch import kabsch_rotation, align_positions, align_noise
from .scalers import DataScaler, parse_normalize_factors
from .features import (
    pairwise_sq_dist,
    spatial_adjacency,
    rw_spd_features,
    timestep_embedding,
)
