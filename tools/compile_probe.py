"""Bisect the fast-path cold-compile blowup (VERDICT r3: compile_s=1379.6).

Times jax trace+lower and backend compile of the whole-pose program
(``render_pose_on_device``) at the bench chunk shape for one named variant
per process, with the persistent compile cache OFF so every measurement is
cold. Compile time is independent of the pose's chunk count (the ``lax.map``
body compiles once), so the probe uses a small pose by default.

Usage:
    python tools/compile_probe.py VARIANT [--h 128] [--w 128] [--chunk 4096]
    JAX_PLATFORMS=cpu python tools/compile_probe.py VARIANT   # XLA-generic?

Variants (each an independent spec/monkeypatch delta from the bench spec):
    exact         bench exact spec (golden fine union re-evaluation)
    fast          bench production spec (FAST_FINE)
    fast_1sort    FAST_FINE with sort_samples_planar replaced by a key-only
                  sort + take_along_axis gathers (semantics-equal, different
                  lowering: no 5-operand variadic sort in the fine stage)
    fast_nosort   FAST_FINE with sort_samples_planar replaced by identity
                  (WRONG numerics — isolates the sort's compile cost)
    fast_noflags  FAST_FINE with the fine stage's per-ray keep flags dropped
                  (fine tile flags == coarse hit flags)
    fast_nofine   FAST_FINE with the fine field eval replaced by zeros
                  (WRONG numerics — isolates the second kernel set)
    fast_ee3      FAST_FINE + EARLY_EXIT_SEGMENTS=3 (the production recipe)

Prints one JSON line: {"variant", "lower_s", "compile_s", "backend"}.
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
    p.add_argument("variant")
    p.add_argument("--h", type=int, default=128)
    p.add_argument("--w", type=int, default=128)
    p.add_argument("--chunk", type=int, default=4096)
    p.add_argument("--tile-cols", type=int, default=64)
    p.add_argument("--run", action="store_true",
                   help="also execute the compiled program once")
    p.add_argument("--hlo", action="store_true",
                   help="census only: lower (no backend compile) and count "
                        "Mosaic custom-calls + HLO size — each distinct "
                        "tpu_custom_call payload is a separate Mosaic "
                        "compile, the TPU-specific cost the CPU backend "
                        "cannot see")
    args = p.parse_args()

    # cold: no persistent cache reads or writes
    os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

    from stnerf_tpu.utils import tpu_reachable
    if os.environ.get("JAX_PLATFORMS", "") != "cpu" and not tpu_reachable():
        print(json.dumps({"variant": args.variant,
                          "error": "TPU tunnel unreachable"}))
        sys.exit(1)

    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the axon sitecustomize re-selects "axon,cpu" programmatically;
        # mirror tests/conftest.py to genuinely probe the CPU backend
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from stnerf_tpu.config import get_cfg
    from stnerf_tpu.models import EditState, SceneBoxes, init_layered_params
    from stnerf_tpu.models.layered import LayeredSpec
    from stnerf_tpu.render import pose_device

    cfg = get_cfg()
    cfg.DATASETS.LAYER_NUM = 2
    cfg.MODEL.COARSE_RAY_SAMPLING = 90
    cfg.MODEL.FINE_RAY_SAMPLING = 30
    cfg.MODEL.SAMPLE_METHOD = "BBOX"
    cfg.MODEL.POSE_REFINEMENT = False
    cfg.MODEL.USE_SPACE_TIME = True
    cfg.MODEL.USE_DEFORM_TIME = True
    cfg.MODEL.DEEP_RGB = False
    # the probe builds every variant up from the EXACT path (fast flags are
    # config defaults since round 5 — strip them here)
    cfg.TPU.FAST_FINE = False
    cfg.TPU.EARLY_EXIT_SEGMENTS = 0
    spec = LayeredSpec.from_cfg(cfg)

    v = args.variant
    if v != "exact":
        spec = dataclasses.replace(spec, fast_fine=True)
    if v == "fast_ee3":
        spec = dataclasses.replace(spec, coarse_exit_segments=3)

    from stnerf_tpu.models import layered as layered_mod
    from stnerf_tpu.ops import volume as volume_mod

    if v == "fast_1sort":
        def sort_gather(t, rgb, sigma):
            idx = jnp.argsort(t, axis=-1)
            tg = jnp.take_along_axis(t, idx, axis=-1)
            rg = jnp.take_along_axis(rgb, idx[:, None], axis=-1)
            sg = jnp.take_along_axis(sigma, idx, axis=-1)
            return tg, rg, sg
        layered_mod.sort_samples_planar = sort_gather
    elif v == "fast_nosort":
        layered_mod.sort_samples_planar = lambda t, rgb, sigma: (t, rgb, sigma)
    elif v == "fast_noflags":
        orig = layered_mod._eval_fields

        def no_ray_flags(params, spec_, xyz, dirs_p, frame_ids, fine=False,
                         active=None, ray_hit=None):
            if fine and ray_hit is not None:
                ray_hit = None
            return orig(params, spec_, xyz, dirs_p, frame_ids, fine=fine,
                        active=active, ray_hit=ray_hit)
        layered_mod._eval_fields = no_ray_flags
    elif v == "fast_nofine":
        orig = layered_mod._eval_fields

        def zero_fine(params, spec_, xyz, dirs_p, frame_ids, fine=False,
                      active=None, ray_hit=None):
            if fine:
                lp1, _, N, S = xyz.shape
                return (jnp.zeros((lp1, 3, N, S), jnp.float32),
                        jnp.zeros((lp1, N, S), jnp.float32))
            return orig(params, spec_, xyz, dirs_p, frame_ids, fine=fine,
                        active=active, ray_hit=ray_hit)
        layered_mod._eval_fields = zero_fine

    params = init_layered_params(jax.random.PRNGKey(0), spec)
    params = dict(params, bkgd_fine=params["bkgd_coarse"],
                  layers_fine=params["layers_coarse"])
    scene = SceneBoxes(
        bkgd_box=jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]]),
        boxes=jnp.tile(jnp.array([[[-1.0, -1, 0], [1, 1, 2]],
                                  [[-1.0, 1, 0], [1, 3, 2]]])[None],
                       (3, 1, 1, 1)),
        bkgd_near_far=jnp.array([0.5, 16.0]))
    f = 0.9 * args.w
    K = jnp.asarray([[f, 0, args.w / 2], [0, f, args.h / 2], [0, 0, 1]],
                    jnp.float32)
    c2w = jnp.eye(4).at[:3, 3].set(jnp.array([0.0, 0.0, -5.0]))
    fids = jnp.ones((3,), jnp.float32)
    nf = jnp.asarray([0.5, 16.0], jnp.float32)
    edits = EditState.identity(spec.layer_num)

    fn = pose_device.render_pose_on_device
    kwargs = dict(h=args.h, w=args.w, chunk=args.chunk,
                  tile_cols=args.tile_cols, key=jax.random.PRNGKey(1))

    t0 = time.time()
    lowered = fn.lower(params, spec, scene, K, c2w, fids, nf, edits, **kwargs)
    lower_s = time.time() - t0
    if args.hlo:
        txt = lowered.as_text()
        # each distinct Mosaic payload is a separate kernel compile;
        # call sites sharing a payload compile once
        import re
        sites = re.findall(r'custom_call[^\n]*?"?tpu_custom_call"?', txt)
        payloads = set(re.findall(r'kernel_name[^,}]*', txt))
        print(json.dumps({"variant": v, "lower_s": round(lower_s, 1),
                          "hlo_lines": txt.count("\n"),
                          "custom_call_sites": len(sites),
                          "distinct_kernel_names": sorted(
                              p[:60] for p in payloads),
                          "backend": jax.default_backend()}))
        return
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    out = {"variant": v, "lower_s": round(lower_s, 1),
           "compile_s": round(compile_s, 1),
           "backend": jax.default_backend(),
           "h": args.h, "w": args.w, "chunk": args.chunk}
    if args.run:
        t0 = time.time()
        r = compiled(params, scene, K, c2w, fids, nf, edits,
                     key=jax.random.PRNGKey(1))
        float(jax.device_get(jnp.sum(r.depth.astype(jnp.float32))))
        out["run_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
