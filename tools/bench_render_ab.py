"""A/B the inference approximation knobs on a TRAINED checkpoint.

Renders one ground-truth pose of a trained scene under a ladder of render
configurations and reports device-time throughput + PSNR against the exact
(reference-semantics) golden path:

    exact                 golden: full union fine re-evaluation, no skips
                          (ref: modeling/layered_rfrender.py:382-606)
    fast_fine             TPU.FAST_FINE opacity-driven fine stage
    + early_exit          TPU.EARLY_EXIT_SEGMENTS transmittance early exit
    + occupancy           TPU.OCCUPANCY_SKIP tightened per-frame boxes

The approximations are weight-dependent (skip rates follow the trained
density field), so unlike bench.py this harness only means anything on a
real checkpoint — train one first (e.g. tools/train.py -c
configs/config_synthetic.yml).

Usage:
    python tools/bench_render_ab.py -c configs/config_synthetic.yml \
        [--width 1920 --height 1080] [--pose 0] [--frame 1] \
        [--segments 3] [--occ-grid 64] [--occ-tau 1.0]

Prints one JSON line per variant plus a summary line.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--width", type=int, default=0, help="render width (0 = SIZE_TEST)")
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--pose", type=int, default=0, help="gt camera index")
    p.add_argument("--frame", type=int, default=1)
    p.add_argument("--segments", type=int, default=3,
                   help="EARLY_EXIT_SEGMENTS for the early-exit variants")
    p.add_argument("--occ-grid", type=int, default=64)
    p.add_argument("--occ-tau", type=float, default=-1.0,
                   help="manual occupancy threshold; default -1 = automatic "
                        "quality-bounded tau (TPU.OCC_AUTO_TAU semantics: "
                        "largest per-(layer,frame) tau whose culling bound "
                        "holds --occ-db worst case)")
    p.add_argument("--occ-db", type=float, default=40.0,
                   help="PSNR floor for the automatic tau bound")
    p.add_argument("--occ-slices", type=int, default=0,
                   help="add a TPU.OCC_SLICES sub-box variant (0 = off)")
    p.add_argument("--gap-skip", action="store_true",
                   help="with --occ-slices: add a TPU.OCC_GAP_SKIP variant "
                        "(stratify within the union of slice intervals)")
    p.add_argument("--inflate", type=float, default=0.0,
                   help="inflate every performer box about its center by "
                        "this factor before the A/B — simulates the loose "
                        "point-cloud hull boxes of real capture data "
                        "(occupancy variants re-tighten from the field)")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--gt-synthetic", action="store_true",
                   help="also report PSNR against the ANALYTIC ground truth "
                        "of the synthetic scene, ray-cast on host at the A/B "
                        "resolution. Separates real quality loss from "
                        "quadrature shift: tightened boxes re-stratify the "
                        "fixed sample budget, so vs-exact PSNR penalizes a "
                        "sample-position change even when no matter was "
                        "culled; vs-GT answers what a viewer sees")
    p.add_argument("--gt-blobs", type=int, default=1,
                   help="blobs per performer used to generate the scene")
    p.add_argument("--gt-spread", type=float, default=0.0,
                   help="blob_spread used to generate the scene")
    p.add_argument("--gt-axis", type=int, default=-1,
                   help="blob_axis used to generate the scene")
    args = p.parse_args()

    from stnerf_tpu.utils import enable_compilation_cache, tpu_reachable
    if not tpu_reachable(attempts=6):
        print(json.dumps({"error": "TPU tunnel unreachable"}))
        sys.exit(1)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stnerf_tpu.config import get_cfg
    from stnerf_tpu.data import RenderScene
    from stnerf_tpu.engine.checkpoint import latest_checkpoint, load_params_any
    from stnerf_tpu.models import EditState
    from stnerf_tpu.models.layered import LayeredSpec
    from stnerf_tpu.render.occupancy import refine_scene_boxes
    from stnerf_tpu.render.pose_device import render_pose_on_device

    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    cfg.freeze()

    dataset = RenderScene(cfg)
    # ladder rungs are built up from the EXACT path (fast flags are config
    # defaults since round 5 — strip them so "exact" means exact)
    spec = dataclasses.replace(
        LayeredSpec.from_cfg(cfg, camera_num=dataset.camera_num),
        fast_fine=False, coarse_exit_segments=0)
    ckpt = latest_checkpoint(cfg.OUTPUT_DIR)
    if ckpt is None:
        print(json.dumps({"error": f"no checkpoint under {cfg.OUTPUT_DIR}"}))
        sys.exit(1)
    params = load_params_any(ckpt, spec)
    scene = dataset.scene_boxes
    if args.inflate and args.inflate != 1.0:
        from stnerf_tpu.models import SceneBoxes
        b = np.asarray(scene.boxes)                   # (F, L, 2, 3)
        center = b.mean(axis=-2, keepdims=True)
        live = np.all(b[..., 1, :] > b[..., 0, :], axis=-1)[..., None, None]
        scene = SceneBoxes(
            bkgd_box=scene.bkgd_box,
            boxes=jnp.asarray(np.where(
                live, center + (b - center) * args.inflate, b)),
            bkgd_near_far=scene.bkgd_near_far)

    w0, h0 = cfg.INPUT.SIZE_TEST
    W = args.width or w0
    H = args.height or h0
    K = np.array(dataset.Ks[args.pose], np.float32).copy()
    K[0] *= W / w0
    K[1] *= H / h0
    c2w = np.array(dataset.poses[args.pose], np.float32)
    if c2w.shape == (3, 4):
        c2w = np.concatenate([c2w, [[0, 0, 0, 1]]], 0).astype(np.float32)
    lp1 = spec.layer_num + 1
    fids = jnp.full((lp1,), float(args.frame), jnp.float32)
    nf = jnp.asarray(scene.bkgd_near_far)
    edits = EditState.identity(spec.layer_num)
    key = jax.random.PRNGKey(1)
    n = W * H
    kw = dict(h=H, w=W, chunk=cfg.TPU.RENDER_CHUNK,
              tile_cols=cfg.TPU.TILE_COLS, key=key)

    occ_kw = (dict(auto_tau_db=args.occ_db) if args.occ_tau < 0
              else dict(sigma_thresh=args.occ_tau))
    occ_scene = refine_scene_boxes(params, spec, scene, grid=args.occ_grid,
                                   **occ_kw)
    ov = np.prod(np.asarray(scene.boxes)[..., 1, :]
                 - np.asarray(scene.boxes)[..., 0, :], axis=-1)
    nv = np.prod(np.asarray(occ_scene.boxes)[..., 1, :]
                 - np.asarray(occ_scene.boxes)[..., 0, :], axis=-1)
    vol_ratio = float(np.sum(nv) / max(np.sum(ov), 1e-9))

    fast = dataclasses.replace(spec, fast_fine=True)
    exit_ = dataclasses.replace(fast, coarse_exit_segments=args.segments)
    variants = [
        ("exact", spec, scene),
        ("fast_fine", fast, scene),
        ("fast+early_exit", exit_, scene),
        ("fast+exit+occupancy", exit_, occ_scene),
        ("fast+occupancy", fast, occ_scene),
    ]
    if args.occ_slices > 1:
        sliced_scene = refine_scene_boxes(params, spec, scene,
                                          grid=args.occ_grid,
                                          slices=args.occ_slices, **occ_kw)
        variants.append(("fast+exit+occ_slices", exit_, sliced_scene))
        if args.gap_skip:
            gap = dataclasses.replace(exit_, occ_gap_skip=True)
            variants.append(("fast+exit+slices+gapskip", gap, sliced_scene))

    gt_tiles = None
    if args.gt_synthetic:
        from stnerf_tpu.data.cameras import pixel_rays
        from stnerf_tpu.data.synthetic import raycast
        from stnerf_tpu.render.pose_device import tile_pixel_coords
        rays = pixel_rays(K, c2w, H, W)
        gt_rgb, _, _ = raycast(rays[:, :3], rays[:, 3:6], args.frame,
                               cfg.DATASETS.FRAME_NUM, cfg.DATASETS.LAYER_NUM,
                               args.gt_blobs, args.gt_spread, args.gt_axis)
        vs_t, us_t, valid = tile_pixel_coords(H, W, cfg.TPU.RENDER_CHUNK,
                                              cfg.TPU.TILE_COLS)
        # device output stays in tile order — scramble GT the same way and
        # mask padding slots out of the metric
        gt_tiles = gt_rgb.reshape(H, W, 3)[vs_t, us_t]
        gt_valid = valid[:, None].astype(np.float32)

    def frame(s, sc):
        out = render_pose_on_device(params, s, sc, jnp.asarray(K),
                                    jnp.asarray(c2w), fids, nf, edits, **kw)
        float(jax.device_get(jnp.sum(out.depth.astype(jnp.float32))))
        return out

    results = {}
    ref_img = None
    for name, s, sc in variants:
        t0 = time.time()
        out = frame(s, sc)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            out = frame(s, sc)
            best = min(best, time.time() - t0)
        if ref_img is None:
            ref_img = out.color
            psnr = float("inf")
        else:
            mse = jnp.mean(jnp.square((out.color.astype(jnp.float32)
                                       - ref_img.astype(jnp.float32)) / 255.0))
            psnr = float(jax.device_get(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12))))
        results[name] = {"sec_per_frame": round(best, 3),
                         "mrays_per_s": round(n / best / 1e6, 4),
                         "psnr_vs_exact_db": round(psnr, 1),
                         "compile_s": round(compile_s, 1)}
        if gt_tiles is not None:
            img = np.asarray(jax.device_get(out.color)).astype(np.float32) / 255.0
            mse_gt = float(np.sum(((img - gt_tiles) ** 2) * gt_valid)
                           / (3.0 * gt_valid.sum()))
            results[name]["psnr_vs_gt_db"] = round(
                -10.0 * np.log10(max(mse_gt, 1e-12)), 2)
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({
        "metric": "render_ab_trained",
        "checkpoint": ckpt, "width": W, "height": H,
        "occ_box_volume_ratio": round(vol_ratio, 4),
        "speedup_fast": round(results["exact"]["sec_per_frame"]
                              / results["fast_fine"]["sec_per_frame"], 3),
        "speedup_all": round(results["exact"]["sec_per_frame"]
                             / results["fast+exit+occupancy"]["sec_per_frame"], 3),
        "results": results}))


if __name__ == "__main__":
    main()
