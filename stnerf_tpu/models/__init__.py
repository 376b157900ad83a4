from .spacenet import SpaceNetSpec, init_spacenet, apply_spacenet
from .motionnet import MotionNetSpec, init_motionnet, apply_motionnet
from .camera import init_camera_transform, apply_camera_transform
from .layered import (LayeredSpec, RayInputs, SceneBoxes, EditState,
                      LayerOutputs, RenderOutputs, init_layered_params,
                      render_rays, compute_scale_pivot)
from .rays import unpack_rays, pack_rays, pad_to_multiple
from .io_torch import (params_from_state_dict, state_dict_from_params,
                       load_reference_checkpoint)

__all__ = [
    "SpaceNetSpec", "init_spacenet", "apply_spacenet",
    "MotionNetSpec", "init_motionnet", "apply_motionnet",
    "init_camera_transform", "apply_camera_transform",
    "LayeredSpec", "RayInputs", "SceneBoxes", "EditState", "LayerOutputs",
    "RenderOutputs", "init_layered_params", "render_rays", "compute_scale_pivot",
    "unpack_rays", "pack_rays", "pad_to_multiple",
    "params_from_state_dict", "state_dict_from_params", "load_reference_checkpoint",
]
