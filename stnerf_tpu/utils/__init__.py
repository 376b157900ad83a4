from .jax_setup import enable_compilation_cache, setup_logger, tpu_reachable
from .misc import (add_two_dim_dict, add_three_dim_dict, vis_density,
                   corrupt_cameras)
from .profiling import trace, phase, device_memory_stats
from .tb_writer import EventWriter

__all__ = ["enable_compilation_cache", "setup_logger", "add_two_dim_dict",
           "add_three_dim_dict", "vis_density", "corrupt_cameras",
           "trace", "phase", "device_memory_stats", "EventWriter"]
