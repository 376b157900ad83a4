"""Generate the synthetic validation scene (reference dataset layout).

Usage: python tools/make_synthetic.py --root data/synthetic
       [--width 200 --height 150 --cams 12 --frames 5 --layers 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data/synthetic")
    p.add_argument("--width", type=int, default=200)
    p.add_argument("--height", type=int, default=150)
    p.add_argument("--cams", type=int, default=12)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bbox-slack", type=float, default=0.0,
                   help="inflate performer hull boxes by this fraction via "
                        "invisible outlier points (loose-box regime)")
    p.add_argument("--blobs", type=int, default=1,
                   help="spheres per performer body; >1 = articulated "
                        "performers whose PLY hulls carry interior gaps")
    p.add_argument("--blob-spread", type=float, default=0.0,
                   help="how far limb blobs articulate from the torso "
                        "(world units, grows over the sequence)")
    p.add_argument("--blob-axis", type=int, default=-1,
                   help="articulate limbs along this world axis (0/1/2) "
                        "with small transverse jitter; -1 = random 3D "
                        "directions")
    p.add_argument("--label-noise", type=float, default=0.0,
                   help="boundary-biased segmentation label error rate "
                        "(plus rate/10 uniform salt)")
    args = p.parse_args()

    from stnerf_tpu.data import make_synthetic_scene

    make_synthetic_scene(args.root, width=args.width, height=args.height,
                         num_cams=args.cams, num_frames=args.frames,
                         layer_num=args.layers, seed=args.seed,
                         bbox_slack=args.bbox_slack, blobs=args.blobs,
                         blob_spread=args.blob_spread,
                         blob_axis=args.blob_axis,
                         label_noise=args.label_noise)
    print(f"synthetic scene written to {args.root}: {args.cams} cams x "
          f"{args.frames} frames x {args.layers}+1 layers at "
          f"{args.width}x{args.height}")


if __name__ == "__main__":
    main()
