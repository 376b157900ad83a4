"""Training entry point.

The reference implies but never ships a train script (its demos import
``do_train``; SURVEY.md §3.3). This CLI assembles the full loop: ray-pool
pregeneration, model init (or resume / reference-checkpoint import), the
jitted SPMD train step over the device mesh, periodic validation renders and
checkpointing.

Usage: python tools/train.py -c configs/config_walking.yml
       [--resume] [--epochs N] [--seed S] [--psnr-thres X]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


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
    args = p.parse_args()

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
        try:
            from torch.utils.tensorboard import SummaryWriter
            swriter = SummaryWriter(os.path.join(cfg.OUTPUT_DIR, "tb"))
        except Exception:
            logger.warning("tensorboard unavailable; scalar logging disabled")

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
