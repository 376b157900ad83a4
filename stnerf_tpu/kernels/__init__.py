from .fused_spacenet import (TILE, fused_spacenet, fused_spacenet_planar,
                             fused_spacenet_stacked, prepare_kernel_params,
                             prepare_kernel_params_planar)

__all__ = ["TILE", "fused_spacenet", "fused_spacenet_planar",
           "fused_spacenet_stacked", "prepare_kernel_params",
           "prepare_kernel_params_planar"]
