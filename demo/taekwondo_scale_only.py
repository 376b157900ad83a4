"""Rerun ONLY the per-layer-scale drive of the taekwondo demo (the third
``run(...)`` of demo/taekwondo_demo.py) — recovery entry for a drive
interrupted by a TPU-tunnel outage; edits identical to the full demo."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stnerf_tpu.config import get_cfg
from stnerf_tpu.render import LayeredNeuralRenderer
from stnerf_tpu.utils import enable_compilation_cache

parser = argparse.ArgumentParser()
parser.add_argument("-c", "--config", default="")
parser.add_argument("-g", "--gpu", type=int, default=0)
args = parser.parse_args()

enable_compilation_cache()
cfg = get_cfg()
cfg.merge_from_file(args.config)
cfg.freeze()

key_frames_layer_1 = [21, 49, 74, 87]
key_frames_layer_2 = [13, 42, 80, 90]
key_frames = [20, 50, 74, 85]

r = LayeredNeuralRenderer(cfg, scale=[1, 0.75, 1.5])
r.set_save_dir("scale")
r.set_fps(25)
r.set_smooth_path_poses(
    int(os.environ.get("STNERF_DEMO_POSES", 101)), around=False)
r.retime_by_key_frames(1, key_frames_layer_1, key_frames)
r.retime_by_key_frames(2, key_frames_layer_2, key_frames)
r.render_path(False, 0, auto_save=True)
r.save_video()
