"""Training-throughput micro-benchmark (TPU).

Times the scanned training epoch (engine.trainer.make_train_epoch) on a
synthetic taekwondo-shaped workload and reports rays/s. ``--kernel on|off``
toggles the hand-differentiated fused SpaceNet kernel
(cfg.TPU.TRAINABLE_KERNEL) for A/B against the pure-XLA training path.

Usage:  python -u tools/bench_train.py --kernel on --steps 16 --batch 2000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", choices=["on", "off"], default="on")
    ap.add_argument("--pose", choices=["on", "off"], default="off",
                    help="POSE_REFINEMENT: learnable per-camera pose "
                         "correction (taekwondo config enables it)")
    ap.add_argument("--compact", choices=["on", "off"], default="off",
                    help="compact pixel pool with on-device ray decode "
                         "(the capture-scale production path)")
    ap.add_argument("--compositor", choices=["xla", "kernel"], default="xla",
                    help="sort-free merged compositor inner terms: XLA "
                         "einsum cubes (default/golden) or the Pallas "
                         "cross-transmittance kernels "
                         "(cfg.TPU.COMPOSITOR_KERNEL)")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument("--coarse", type=int, default=48)
    ap.add_argument("--fine", type=int, default=24)
    ap.add_argument("--pool", type=int, default=65536)
    ap.add_argument("--block", type=int, default=1,
                    help="draw contiguous blocks of this many rays (the "
                         "hit-ordered capture-pool path, TPU.POOL_BLOCK_DRAW"
                         "); with --hitmix the pool is group-ordered like "
                         "data/raygen.order_pool_by_hit would")
    ap.add_argument("--hitmix", type=str, default="",
                    help="target bbox-hit-pattern mix 'none,l1,l2,both' as "
                         "fractions (e.g. '0.13,0.36,0.30,0.21' = the "
                         "capture1080 pool's measured mix). Default: the "
                         "legacy random-direction workload (~95% miss — "
                         "far sparser than a real capture pool, where "
                         "selection deliberately samples performer pixels)")
    args = ap.parse_args()

    from stnerf_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

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
    cfg.MODEL.POSE_REFINEMENT = args.pose == "on"
    cfg.MODEL.USE_SPACE_TIME = True
    cfg.MODEL.USE_DEFORM_TIME = True
    cfg.MODEL.DEEP_RGB = False
    cfg.MODEL.COARSE_RAY_SAMPLING = args.coarse
    cfg.MODEL.FINE_RAY_SAMPLING = args.fine
    cfg.MODEL.REMOVE_OUTLIERS = True
    cfg.TPU.TRAINABLE_KERNEL = args.kernel == "on"
    cfg.TPU.COMPOSITOR_KERNEL = args.compositor == "kernel"
    spec = LayeredSpec.from_cfg(cfg, camera_num=16 if args.pose == "on" else 0)

    params = init_layered_params(jax.random.PRNGKey(0), spec)
    scene = SceneBoxes(
        bkgd_box=jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]]),
        boxes=jnp.tile(jnp.array([[[-1.0, -1, 0], [1, 1, 2]],
                                  [[-1.0, 1, 0], [1, 3, 2]]])[None], (3, 1, 1, 1)),
        bkgd_near_far=jnp.array([0.5, 16.0]))

    n = args.pool
    rng = np.random.default_rng(0)
    if args.hitmix:
        # aim each ray at a region producing the requested hit pattern:
        # box1 y in [-1,1], box2 y in [1,3] (they share the y=1 face), so a
        # ray from (0,0,-5) through (x, y, 1) hits l1-only / both / l2-only
        # by its y target; 'none' aims far off +x. Shuffled so batches draw
        # the mix, grouped only by the hit-ordered pool machinery if on.
        fr = np.array([float(x) for x in args.hitmix.split(",")], np.float64)
        assert len(fr) == 4 and abs(fr.sum() - 1.0) < 1e-6, fr
        counts = (fr * n).astype(int)
        counts[0] += n - counts.sum()
        ys = [rng.uniform(8.0, 10.0, counts[0]),      # none: above both
              rng.uniform(-0.9, 0.7, counts[1]),      # l1 only
              rng.uniform(1.3, 2.9, counts[2]),       # l2 only
              rng.uniform(0.95, 1.05, counts[3])]     # through the shared face
        y = np.concatenate(ys)
        x = rng.uniform(-0.9, 0.9, n)
        tgt = np.stack([x, y, np.full(n, 1.0)], -1).astype(np.float32)
        d = tgt - np.array([0, 0, -5.0], np.float32)
        if args.block > 1:
            # keep the pattern-group order (shuffle within groups), as the
            # hit-ordered pool assembly does
            off = 0
            order = []
            for c in counts:
                order.append(off + rng.permutation(c))
                off += c
            order = np.concatenate(order)
        else:
            order = rng.permutation(n)
        d = d[order]
    else:
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d[:, 2] += 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pool = TrainBatch(
        inputs=RayInputs(
            rays_o=jnp.asarray(np.tile(np.array([[0, 0, -5.0]], np.float32), (n, 1))),
            rays_d=jnp.asarray(d),
            frame_ids=jnp.asarray(rng.integers(0, 3, size=(n, 3)).astype(np.float32)),
            cam_ids=jnp.asarray(rng.integers(0, 16, size=(n,)).astype(np.float32)),
            near_far=jnp.tile(jnp.array([[0.5, 16.0]], jnp.float32), (n, 1))),
        rgb=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        labels=jnp.asarray(rng.integers(0, 3, size=(n,)).astype(np.int32)))
    decode = None
    if args.compact == "on":
        # re-encode the same workload as a compact pixel pool; rays decode
        # on device per batch (engine/trainer.make_decode)
        from stnerf_tpu.engine.trainer import (CamTables, CompactPool,
                                               make_decode)
        M, W, H = 16, 1920, 1080
        K = np.array([[1000.0, 0, 960], [0, 1000, 540], [0, 0, 1]], np.float32)
        tables = CamTables(
            inv_K=jnp.asarray(np.tile(np.linalg.inv(K)[None], (M, 1, 1))),
            rot=jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (M, 1, 1))),
            origin=jnp.asarray(np.tile(np.array([0, 0, -5.0], np.float32), (M, 1))),
            near_far=jnp.asarray(np.tile(np.array([0.5, 16.0], np.float32),
                                         (3, 4, M, 1))))
        if args.hitmix:
            # keep the aimed hit-mix geometry: invert the pinhole (identity
            # rotation) so the decoded rays reproduce the target dirs to
            # pixel quantization — u = fx*dx/dz + cx. v may exceed H for
            # the 'none' rays (aimed above both boxes); pix stays a plain
            # v*W + u linearization either way.
            dd = np.asarray(d)
            u = np.clip(np.round(K[0, 0] * dd[:, 0] / dd[:, 2] + K[0, 2]),
                        0, W - 1).astype(np.int64)
            v = np.round(K[1, 1] * dd[:, 1] / dd[:, 2] + K[1, 2]).astype(np.int64)
            pix = (v * W + u).astype(np.uint32)
        else:
            pix = rng.integers(0, W * H, n).astype(np.uint32)
        pool = CompactPool(
            cams=jnp.asarray(rng.integers(0, M, n).astype(np.uint16)),
            pix=jnp.asarray(pix),
            frames=jnp.asarray(rng.integers(1, 4, n).astype(np.uint16)),
            labels=jnp.asarray(rng.integers(0, 3, n).astype(np.uint8)),
            bbox_labels=jnp.asarray(rng.integers(0, 3, n).astype(np.uint8)),
            rgb=jnp.asarray(rng.integers(0, 256, (n, 3)).astype(np.uint8)))
        decode = make_decode(tables, spec, W)
    pool = jax.device_put(pool)

    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    epoch_fn = make_train_epoch(spec, optimizer, remove_outliers=True,
                                decode=decode, block=args.block)

    def run(params, opt_state, seed):
        params, opt_state, metrics = epoch_fn(
            params, opt_state, scene, pool, jax.random.PRNGKey(seed),
            jnp.asarray(1.0), batch_size=args.batch, steps=args.steps,
            only_coarse=False)
        # tunnel-safe sync: pull a small reduction, not block_until_ready
        loss = float(jax.device_get(jnp.mean(metrics.loss)))
        return params, opt_state, loss

    t0 = time.time()
    params, opt_state, loss = run(params, opt_state, 0)
    print(f"compile+first epoch: {time.time() - t0:.1f}s  loss={loss:.4f}",
          flush=True)

    times = []
    for i in range(3):
        t0 = time.time()
        params, opt_state, loss = run(params, opt_state, i + 1)
        dt = time.time() - t0
        times.append(dt)
        rays_s = args.steps * args.batch / dt
        print(f"epoch {i}: {dt:.3f}s  {rays_s:.0f} rays/s  loss={loss:.4f}",
              flush=True)

    best = args.steps * args.batch / min(times)
    print(f"RESULT kernel={args.kernel} pose={args.pose} "
          f"compact={args.compact} compositor={args.compositor} "
          f"coarse={args.coarse} fine={args.fine} "
          f"batch={args.batch}: {best:.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
