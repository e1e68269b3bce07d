from .positional import sinusoidal_positional_encoding
from .masking import window_mask, band_offsets, pad_to_bucket, bucket_for
from .selection import (
    topk_select,
    bin_max_select,
    aks_select,
    gumbel_topk,
    uniform_sample_indices,
    generate_uniform_integers,
)

__all__ = [
    "sinusoidal_positional_encoding",
    "window_mask",
    "band_offsets",
    "pad_to_bucket",
    "bucket_for",
    "topk_select",
    "bin_max_select",
    "aks_select",
    "gumbel_topk",
    "uniform_sample_indices",
    "generate_uniform_integers",
]
