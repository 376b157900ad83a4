"""Training entry point.

The reference implies but never ships a train script (its demos import
``do_train``; SURVEY.md §3.3). This CLI assembles the full loop: ray-pool
pregeneration, model init (or resume / reference-checkpoint import), the
jitted SPMD train step over the device mesh, periodic validation renders and
checkpointing.

Usage: python tools/train.py -c configs/config_walking.yml
       [--resume] [--epochs N] [--seed S] [--psnr-thres X]
       [--auto-restart N]

``--auto-restart N`` supervises the run: on a crash (TPU runtime death,
tunnel outage, OOM — this environment's TPU workers demonstrably die
mid-run, RESULTS.md) the training process is relaunched with ``--resume``
up to N times, losing at most one checkpoint segment (the segmented epoch
saves every SOLVER.CHECKPOINT_PERIOD steps and --resume restores mid-epoch
position). The supervisor itself never touches the TPU — one TPU process
at a time is an environment invariant.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_BACKOFF_S = (15, 30, 60, 120, 300)  # then 300 s between further restarts


def supervise(cmd, restarts, backoffs=_BACKOFF_S, run=None):
    """Run ``cmd`` (argv list); on nonzero exit relaunch it up to
    ``restarts`` times with increasing backoff. Returns the final exit
    code (0 on any success). ``run`` injects the launcher for tests
    (defaults to subprocess.call)."""
    if run is None:
        import subprocess

        run = subprocess.call
    for attempt in range(restarts + 1):
        rc = run(cmd)
        if rc == 0:
            return 0
        if attempt == restarts:
            return rc
        wait = backoffs[min(attempt, len(backoffs) - 1)]
        print(f"[supervise] attempt {attempt + 1} exited rc={rc}; "
              f"relaunching with --resume in {wait}s "
              f"({restarts - attempt} restarts left)", file=sys.stderr,
              flush=True)
        time.sleep(wait)
        if "--resume" not in cmd:
            cmd = cmd + ["--resume"]
    return rc


def main():
    p = argparse.ArgumentParser(description="Train a layered ST-NeRF on TPU")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest checkpoint in OUTPUT_DIR")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--psnr-thres", type=float, default=100.0,
                   help="early-stop when mean epoch PSNR exceeds this")
    p.add_argument("--model-parallel", type=int, default=None,
                   help="devices on the model (layer) mesh axis")
    p.add_argument("--workers", type=int, default=None,
                   help="ray-pregeneration processes (default: "
                        "DATALOADER.NUM_WORKERS capped at host CPUs)")
    p.add_argument("--auto-restart", type=int, default=0, metavar="N",
                   help="supervise the run: relaunch with --resume up to N "
                        "times after a crash (TPU worker death, tunnel "
                        "outage); at most one checkpoint segment is lost")
    args = p.parse_args()

    if args.auto_restart > 0:
        # Supervisor process: spawn the actual run as a child (this process
        # must never initialize the TPU backend — one TPU process at a
        # time). The child inherits all flags except --auto-restart; after
        # the first crash --resume is appended so retries continue from the
        # newest (possibly mid-epoch) checkpoint.
        argv, skip = [], False
        for a in sys.argv[1:]:
            if skip:
                skip = False
            elif a == "--auto-restart":
                skip = True
            elif not a.startswith("--auto-restart="):
                argv.append(a)
        sys.exit(supervise([sys.executable, "-u", os.path.abspath(__file__)]
                           + argv, args.auto_restart))

    import jax
    import numpy as np

    from stnerf_tpu.config import get_cfg
    from stnerf_tpu.data import make_train_data, ViewScene
    from stnerf_tpu.engine import (make_optimizer, make_frozen_mask, do_train,
                                   latest_checkpoint, load_checkpoint)
    from stnerf_tpu.models import init_layered_params
    from stnerf_tpu.models.io_torch import load_reference_checkpoint
    from stnerf_tpu.models.layered import LayeredSpec
    from stnerf_tpu.parallel import make_mesh, replicate, shard_params
    from stnerf_tpu.utils import enable_compilation_cache, setup_logger

    enable_compilation_cache()
    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if args.epochs is not None:
        cfg.SOLVER.MAX_EPOCHS = args.epochs
    cfg.freeze()

    logger = setup_logger("stnerf_tpu.train", cfg.OUTPUT_DIR or None)
    logger.info("devices: %s", jax.devices())

    spec = LayeredSpec.from_cfg(cfg)
    logger.info("building training ray pool (cached under %s/%s)...",
                cfg.DATASETS.TRAIN, cfg.DATASETS.TMP_RAYS)
    pool, scene = make_train_data(cfg, spec, np.random.default_rng(args.seed),
                                  workers=args.workers)
    n_rays = pool["pix" if "pix" in pool else "rays"].shape[0]
    logger.info("ray pool: %d rays%s", n_rays,
                " (compact pixel format)" if "pix" in pool else "")

    resume_epoch, resume_step, opt_state = 0, 0, None
    ckpt = latest_checkpoint(cfg.OUTPUT_DIR) if args.resume else None
    if ckpt and ckpt.endswith(".ckpt"):
        blob = load_checkpoint(ckpt)
        params, opt_state = blob["params"], blob.get("opt_state")
        resume_step = int(blob.get("step") or 0)
        # step > 0: a mid-epoch (per-segment) save — re-enter that epoch
        # with its first resume_step steps skipped (position-keyed RNG
        # replays the identical batch schedule)
        resume_epoch = blob["epoch"] - (1 if resume_step else 0)
        logger.info("resumed %s (epoch %d, step %d)", ckpt,
                    blob["epoch"], resume_step)
    elif ckpt:
        params = load_reference_checkpoint(ckpt, spec)
        logger.info("imported reference checkpoint %s", ckpt)
    else:
        params = init_layered_params(jax.random.PRNGKey(args.seed), spec)

    # Epoch training is data-parallel over rays with replicated params (the
    # fields are ~1.2M params; layer-parallel sharding is a render-path
    # option). TPU.MESH_DATA caps the data axis (-1 = all devices).
    mp = args.model_parallel or cfg.TPU.MESH_MODEL
    if mp != 1:
        logger.warning("epoch training replicates params; ignoring "
                       "model_parallel=%d (render-path option only)", mp)
    devices = jax.devices()
    if cfg.TPU.MESH_DATA > 0:
        devices = devices[:cfg.TPU.MESH_DATA]
    mesh = make_mesh(devices)
    params = shard_params(mesh, params)
    scene = replicate(mesh, scene)

    frozen_mask = make_frozen_mask(params, cfg.SOLVER.FROZEN_GROUPS)
    if frozen_mask is not None:
        logger.info("frozen param groups: %s (receive zero updates)",
                    list(cfg.SOLVER.FROZEN_GROUPS))
    optimizer = make_optimizer(cfg, frozen_mask)
    # a resumed opt_state must match the optimizer structure: changing
    # FROZEN_GROUPS across a resume adds/removes the masked wrapper state
    # and fails loudly at the first step (by design)

    swriter = None
    if cfg.OUTPUT_DIR:
        # First-party event writer — torch must NEVER enter this long-lived
        # XLA process (torch-resident XLA compiles SIGSEGV past ~150
        # programs; CLAUDE.md invariant). Same tags/panels as the
        # reference's SummaryWriter usage (ref: engine/layered_trainer.py:
        # 295-309).
        from stnerf_tpu.utils import EventWriter
        swriter = EventWriter(os.path.join(cfg.OUTPUT_DIR, "tb"))

    val_fn = None
    try:
        view_scene = ViewScene(cfg)
        from stnerf_tpu.engine.evaluate import make_val_fn
        val_fn = make_val_fn(cfg, spec, scene, view_scene, logger, swriter)
    except Exception as e:
        logger.warning("validation disabled: %s", e)

    do_train(cfg, spec, params, scene, pool, optimizer, mesh=mesh,
             val_fn=val_fn, resume_epoch=resume_epoch,
             resume_step=resume_step, opt_state=opt_state,
             psnr_thres=args.psnr_thres, seed=args.seed, logger=logger,
             swriter=swriter)


if __name__ == "__main__":
    main()
