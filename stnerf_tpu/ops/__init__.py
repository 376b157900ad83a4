from .encoding import positional_encoding, encoding_dim, lerp_encoded_time
from .sampling import (MISS_T, ray_aabb_intersect, stratified_between,
                       stratified_near_far, sample_pdf, points_along_rays)
from .volume import RenderedRays, render_weights, volume_render, merge_layers, sort_merge_t
from .metrics import mse, mae, psnr, ssim

__all__ = [
    "positional_encoding", "encoding_dim", "lerp_encoded_time",
    "MISS_T", "ray_aabb_intersect", "stratified_between", "stratified_near_far",
    "sample_pdf", "points_along_rays",
    "RenderedRays", "render_weights", "volume_render", "merge_layers", "sort_merge_t",
    "mse", "mae", "psnr", "ssim",
]
