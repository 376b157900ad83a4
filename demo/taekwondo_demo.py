"""Taekwondo-scene demo: retime both performers onto a common timeline, then
render the original, per-layer-shifted, and per-layer-scaled versions —
all edits applied at render time without retraining.

CLI-compatible with the reference demo (ref: demo/taekwondo_demo.py:25-72):
``python demo/taekwondo_demo.py -c configs/config_taekwondo.yml [-g 0]``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stnerf_tpu.config import get_cfg
from stnerf_tpu.render import LayeredNeuralRenderer
from stnerf_tpu.utils import enable_compilation_cache

parser = argparse.ArgumentParser(
    description="Render the taekwondo scene with retiming/shift/scale edits")
parser.add_argument("-c", "--config", default="", help="scene config YAML")
parser.add_argument("-g", "--gpu", type=int, default=0,
                    help="accepted for reference-CLI parity; unused on TPU")
args = parser.parse_args()

enable_compilation_cache()
cfg = get_cfg()
cfg.merge_from_file(args.config)
cfg.freeze()

key_frames_layer_1 = [21, 49, 74, 87]  # performer 1's own timeline
key_frames_layer_2 = [13, 42, 80, 90]  # performer 2's own timeline
key_frames = [20, 50, 74, 85]          # common output timeline
density_threshold = 0
inverse_y_axis = False


def run(name, **renderer_kwargs):
    r = LayeredNeuralRenderer(cfg, **renderer_kwargs)
    r.set_save_dir(name)
    r.set_fps(25)
    # STNERF_DEMO_POSES trims the path on bandwidth-constrained hosts;
    # default matches the reference demo's 101-pose path.
    r.set_smooth_path_poses(
        int(os.environ.get("STNERF_DEMO_POSES", 101)), around=False)
    r.retime_by_key_frames(1, key_frames_layer_1, key_frames)
    r.retime_by_key_frames(2, key_frames_layer_2, key_frames)
    r.render_path(inverse_y_axis, density_threshold, auto_save=True)
    r.save_video()


run("origin")
run("shift", shift=[[0, 0, 0], [0, 2, 0], [0, -2, 0]])
run("scale", scale=[1, 0.75, 1.5])
