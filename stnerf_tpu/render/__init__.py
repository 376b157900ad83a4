from .chunked import render_rays_chunked
from .paths import (lookat_path, lookat_path_centers, retime_frames,
                    smooth_pose_path, spherical_path)
from .renderer import LayeredNeuralRenderer
from .video import write_image, write_video, to_uint8

__all__ = ["render_rays_chunked", "LayeredNeuralRenderer", "smooth_pose_path",
           "lookat_path", "lookat_path_centers", "spherical_path",
           "retime_frames", "write_image", "write_video", "to_uint8"]
