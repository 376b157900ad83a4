"""Prime the persistent XLA compile cache for the bench/demo programs.

The first compile of the full 1080p layered render program costs minutes on
a tunneled TPU and lands in the persistent cache
(``stnerf_tpu.utils.enable_compilation_cache``); every later process then
starts in seconds. Run this once after a code change — in CI, after a pull,
or before a demo session — so the first real frame (and ``bench.py``) never
eats the cold compile:

    python tools/warm_cache.py            # bench-shaped render + train programs
    python tools/warm_cache.py -c configs/config_taekwondo.yml   # scene-shaped

Without ``-c`` this compiles exactly the programs ``bench.py`` times (fast
and exact fine paths at 1080p + the production 90+30 training epoch), so a
subsequent bench run reports warm-cache numbers. With ``-c`` it compiles the
render program for that scene config's model shape instead (what the demos
and ``render/renderer.py`` run).

Compilation happens on whatever backend jax selects — run it on the TPU
host to warm the TPU cache.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def warm_bench():
    import bench

    t0 = time.time()
    # main() compiles fast render, exact render, the sharded-download path
    # and the scanned training epoch, then prints the bench JSON line —
    # which doubles as a smoke check of the warmed programs.
    bench.main()
    print(f"warm_cache: bench programs compiled+run in {time.time() - t0:.1f}s",
          file=sys.stderr)


def warm_config(config_file: str, height: int, width: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stnerf_tpu.config import get_cfg
    from stnerf_tpu.models import EditState, SceneBoxes, init_layered_params
    from stnerf_tpu.models.layered import LayeredSpec
    from stnerf_tpu.render.pose_device import render_pose_on_device

    cfg = get_cfg()
    cfg.merge_from_file(config_file)
    cfg.freeze()
    spec = LayeredSpec.from_cfg(cfg)
    params = init_layered_params(jax.random.PRNGKey(0), spec)

    L = spec.layer_num
    scene = SceneBoxes(
        bkgd_box=jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]]),
        boxes=jnp.tile(jnp.array([[[-1.0, -1, 0], [1.0, 1, 2]]]),
                       (3, max(L, 1), 1, 1)),
        bkgd_near_far=jnp.array([0.5, 16.0]))
    f = 0.9 * width
    K = jnp.asarray(np.array([[f, 0, width / 2], [0, f, height / 2],
                              [0, 0, 1]], np.float32))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, -5.0]

    t0 = time.time()
    out = render_pose_on_device(
        params, spec, scene, K, jnp.asarray(c2w),
        jnp.ones(L + 1, jnp.float32), jnp.asarray([0.5, 16.0], jnp.float32),
        EditState.identity(L), h=height, w=width, chunk=4096, tile_cols=64,
        key=jax.random.PRNGKey(0))
    float(jax.device_get(jnp.sum(out.depth.astype(jnp.float32))))
    print(f"warm_cache: {config_file} render program "
          f"({height}x{width}, {L} layers) compiled in {time.time() - t0:.1f}s",
          file=sys.stderr)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-c", "--config-file", default=None,
                    help="scene config to warm (default: bench shapes)")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    from stnerf_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    if args.config_file:
        warm_config(args.config_file, args.height, args.width)
    else:
        warm_bench()


if __name__ == "__main__":
    main()
