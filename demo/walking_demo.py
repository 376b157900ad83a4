"""Walking-scene demo: render the original view path, then hide performer
layers one by one (layer edits without retraining).

CLI-compatible with the reference demo (ref: demo/walking_demo.py:27-68):
``python demo/walking_demo.py -c configs/config_walking.yml [-g 0]``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stnerf_tpu.config import get_cfg
from stnerf_tpu.render import LayeredNeuralRenderer
from stnerf_tpu.utils import enable_compilation_cache

parser = argparse.ArgumentParser(
    description="Render the layered walking scene with layer-hiding edits")
parser.add_argument("-c", "--config", default="",
                    help="scene config YAML")
parser.add_argument("-g", "--gpu", type=int, default=0,
                    help="accepted for reference-CLI parity; device selection "
                         "is owned by JAX on TPU")
args = parser.parse_args()

enable_compilation_cache()
cfg = get_cfg()
cfg.merge_from_file(args.config)
cfg.freeze()

neural_renderer = LayeredNeuralRenderer(cfg)

density_threshold = 20        # raise to suppress translucent ghosting
bkgd_density_threshold = 0.8
inverse_y_axis = False

neural_renderer.set_fps(25)
neural_renderer.set_pose_duration(1, min(14, neural_renderer.camera_num - 1))
# STNERF_DEMO_POSES trims the camera path on bandwidth-constrained hosts
# (e.g. a tunneled TPU where per-frame download dominates); the default
# matches the reference demo's 100-pose path.
neural_renderer.set_smooth_path_poses(
    int(os.environ.get("STNERF_DEMO_POSES", 100)), around=False)
neural_renderer.set_near(4)
neural_renderer.invert_poses()

neural_renderer.set_save_dir("origin")
neural_renderer.render_path(inverse_y_axis, density_threshold,
                            bkgd_density_threshold, auto_save=True)
neural_renderer.save_video()

neural_renderer.hide_layer(1)
neural_renderer.set_save_dir("hide_man_1")
neural_renderer.render_path(inverse_y_axis, density_threshold,
                            bkgd_density_threshold, auto_save=True)
neural_renderer.save_video()

neural_renderer.hide_layer(2)
neural_renderer.set_save_dir("hide_both")
neural_renderer.render_path(inverse_y_axis, density_threshold,
                            bkgd_density_threshold, auto_save=True)
neural_renderer.save_video()
