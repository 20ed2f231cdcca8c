from .attention import apply_rotary, dot_product_attention, fused_attention, rotary_angles
from .layer_agg import aggregate_layers, layer_indices
from .pearson import (
    PearsonState,
    compute_pearson,
    init_pearson_state,
    pearson_corr,
    update_pearson_state,
)
from .pooling import adaptive_avg_pool1d, adaptive_avg_pool_matrix
from .resample import resample_poly
