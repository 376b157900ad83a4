from .ply import read_ply_points, write_ply_points
from .cameras import (load_camposes, load_intrinsics, load_view_mask,
                      pixel_rays, project_bbox_roi, lookat, spherical_position)
from .transforms import JointTransform
from .scene import FrameLayerScene, corners_from_minmax, minmax_from_corners
from .raygen import (build_ray_pool, generate_frame_layer_rays,
                     prefill_ray_caches, decode_pool_host,
                     transform_is_deterministic)
from .build import RenderScene, ViewScene, make_train_data
from .synthetic import make_synthetic_scene, synthetic_cfg

__all__ = [
    "read_ply_points", "write_ply_points", "load_camposes", "load_intrinsics",
    "load_view_mask", "pixel_rays", "project_bbox_roi", "lookat",
    "spherical_position", "JointTransform", "FrameLayerScene",
    "corners_from_minmax", "minmax_from_corners", "build_ray_pool",
    "generate_frame_layer_rays", "prefill_ray_caches", "decode_pool_host",
    "transform_is_deterministic", "RenderScene",
    "ViewScene", "make_train_data",
    "make_synthetic_scene", "synthetic_cfg",
]
