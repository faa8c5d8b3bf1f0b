from .linear_attention import (
    causal_linear_attention,
    causal_linear_attention_ref,
    draw_orthogonal_features,
    favor_features,
    linear_attention_decode_step,
)
from .sampling import nucleus_sample, nucleus_sample_numpy
