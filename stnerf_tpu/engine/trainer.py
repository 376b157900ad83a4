"""Training engine.

``make_train_step`` builds the jitted SPMD step: forward layered render of a
ray shard, RGB + mask-alpha losses, Adam with the reference's warmup/decay
schedule. With a multi-device mesh the batch is sharded over the ``data``
axis and parameters replicated — jit inserts the gradient ``psum`` over ICI.

``do_train`` is the host loop with the reference trainer's observability:
the same per-LOG_PERIOD "rays/s" log line (ref:
engine/layered_trainer.py:301-306), coarse-only warm stage
(ref: :191-194), periodic validation images, periodic + per-epoch
checkpointing (ref: :311-317), and PSNR-threshold early stop (ref: :325-331).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import EditState, RayInputs, SceneBoxes, render_rays
from ..models.layered import LayeredSpec
from ..ops.metrics import psnr as psnr_fn
from .checkpoint import save_checkpoint
from .loss import mask_alpha_loss, rgb_loss


class TrainBatch(NamedTuple):
    inputs: RayInputs
    rgb: jnp.ndarray     # (N, 3)
    labels: jnp.ndarray  # (N,) int segmentation label


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    rgb_loss: jnp.ndarray
    mask_loss: jnp.ndarray
    psnr_coarse: jnp.ndarray
    psnr_fine: jnp.ndarray


def make_train_step(spec: LayeredSpec, optimizer: optax.GradientTransformation,
                    remove_outliers: bool = False):
    """Returns step(params, opt_state, scene, batch, key, mask_on,
    only_coarse) -> (params, opt_state, StepMetrics). ``only_coarse`` is
    static (two compiled variants); ``mask_on`` is a traced 0/1 scalar so
    epoch scheduling does not retrigger compilation."""

    import dataclasses

    # the fused Pallas forward has no VJP yet; training uses the XLA path
    spec = dataclasses.replace(spec, use_pallas=False)
    edits = EditState.identity(spec.layer_num)

    @functools.partial(jax.jit, static_argnames=("only_coarse",),
                       donate_argnums=(0, 1))
    def step(params, opt_state, scene: SceneBoxes, batch: TrainBatch,
             key, mask_on, only_coarse: bool = False):
        def loss_fn(p):
            out = render_rays(p, spec, scene, batch.inputs, edits, key,
                              only_coarse=only_coarse)
            l_c = rgb_loss(out.coarse.color, batch.rgb)
            m_c = (mask_alpha_loss(out.coarse_layers.acc, batch.labels) * mask_on
                   if remove_outliers else jnp.asarray(0.0))
            loss = l_c + m_c
            l_f = jnp.asarray(0.0)
            m_f = jnp.asarray(0.0)
            if not only_coarse:
                l_f = rgb_loss(out.fine.color, batch.rgb)
                if remove_outliers:
                    m_f = mask_alpha_loss(out.fine_layers.acc, batch.labels) * mask_on
                loss = loss + l_f + m_f
            metrics = StepMetrics(loss, l_c + l_f, m_c + m_f,
                                  psnr_fn(out.coarse.color, batch.rgb),
                                  psnr_fn(out.fine.color, batch.rgb))
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def iterate_ray_batches(rays: np.ndarray, rgbs: np.ndarray, labels: np.ndarray,
                        near_fars: np.ndarray, spec: LayeredSpec,
                        batch_size: int, rng: np.random.Generator) -> Iterator[TrainBatch]:
    """Shuffle the pregenerated ray pool and yield fixed-size device batches
    (replaces the torch DataLoader; ref: data/build.py:13-27).

    The tail remainder is dropped — batch shapes must be static under jit.
    """
    from ..models.rays import unpack_rays

    n = rays.shape[0]
    order = rng.permutation(n)
    for i in range(0, n - batch_size + 1, batch_size):
        idx = order[i:i + batch_size]
        inputs = unpack_rays(rays[idx], spec, near_fars[idx])
        yield TrainBatch(inputs, jnp.asarray(rgbs[idx], jnp.float32),
                         jnp.asarray(labels[idx].reshape(-1), jnp.int32))


def do_train(cfg, spec: LayeredSpec, params, scene: SceneBoxes,
             train_pool: dict, step_fn, optimizer, *,
             val_fn=None, resume_epoch: int = 0, psnr_thres: float = 100.0,
             seed: int = 0, logger: logging.Logger | None = None,
             swriter=None):
    """Epoch loop. ``train_pool`` holds the pregenerated ray arrays
    {rays, rgbs, labels, near_fars}; ``val_fn(params, epoch)`` optionally
    renders validation images."""
    logger = logger or logging.getLogger("stnerf_tpu.train")
    s = cfg.SOLVER
    batch_size = s.IMS_PER_BATCH
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    opt_state = optimizer.init(params)
    global_step = 0

    for epoch in range(1 + resume_epoch, s.MAX_EPOCHS):
        epoch_start = time.time()
        psnr_monitor = []
        only_coarse = epoch < s.COARSE_STAGE
        mask_on = jnp.asarray(1.0 if epoch < 3 else 0.0)
        batches = iterate_ray_batches(train_pool["rays"], train_pool["rgbs"],
                                      train_pool["labels"], train_pool["near_fars"],
                                      spec, batch_size, rng)
        n_batches = max(train_pool["rays"].shape[0] // batch_size, 1)
        for batch_idx, batch in enumerate(batches):
            iter_start = time.time()
            global_step = (epoch - 1) * n_batches + batch_idx
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step_fn(params, opt_state, scene, batch,
                                                 sub, mask_on, only_coarse=only_coarse)

            if batch_idx % s.LOG_PERIOD == 0:
                m = jax.device_get(metrics)
                psnr_monitor.append(float(m.psnr_fine))
                # same line format as the reference (ref: engine/
                # layered_trainer.py:304-306) but honest: rays actually
                # processed this iteration / its wall time (the reference
                # multiplies one iteration's rate by LOG_PERIOD)
                rays_per_s = batch_size / max(time.time() - iter_start, 1e-9)
                logger.info(
                    "Epoch[%d] Iteration[%d/%d] Loss: %.3e  Psnr coarse: %.2f "
                    "Psnr fine: %.2f Speed: %.1f[rays/s]",
                    epoch, batch_idx, n_batches, float(m.loss),
                    float(m.psnr_coarse), float(m.psnr_fine), rays_per_s)
                if swriter is not None:
                    swriter.add_scalar("Loss/train_loss", float(m.loss), global_step)
                    swriter.add_scalar("TrainPsnr", float(m.psnr_fine), global_step)
                    swriter.add_scalar("Loss/mask_loss", float(m.mask_loss), global_step)
                    swriter.add_scalar("Loss/rgb_loss", float(m.rgb_loss), global_step)

            if val_fn is not None and global_step and global_step % 1000 == 0:
                val_fn(params, epoch)
            if cfg.OUTPUT_DIR and global_step and global_step % s.CHECKPOINT_PERIOD == 0:
                save_checkpoint(cfg.OUTPUT_DIR, params, opt_state, epoch, global_step)

        if cfg.OUTPUT_DIR:
            save_checkpoint(cfg.OUTPUT_DIR, params, opt_state, epoch)
        if val_fn is not None:
            val_fn(params, epoch)
        rays_per_s = n_batches * float(s.BUNCH) / max(time.time() - epoch_start, 1e-9)
        logger.info("Epoch %d done. Time: %.3f[s] Speed: %.1f[rays/s]",
                    epoch, time.time() - epoch_start, rays_per_s)

        mean_psnr = float(np.mean(psnr_monitor)) if psnr_monitor else 0.0
        if mean_psnr > psnr_thres:
            logger.info("Mean epoch PSNR %.3f > threshold %.3f, stopping", mean_psnr, psnr_thres)
            break
    return params, opt_state
