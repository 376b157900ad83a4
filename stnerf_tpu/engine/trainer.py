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

    # inference-only fused kernel off; when spec.trainable_kernel is on
    # (cfg.TPU.TRAINABLE_KERNEL), the hand-differentiated SpaceNet kernel
    # (kernels.spacenet_vjp) carries the training MLP work on TPU
    spec = dataclasses.replace(spec, use_pallas=False,
                               nosort_composite=True)
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


def make_train_epoch(spec: LayeredSpec, optimizer: optax.GradientTransformation,
                     remove_outliers: bool = False):
    """Whole-epoch device program: ``lax.scan`` over steps sampling batches
    from a device-resident ray pool.

    Per-step host<->device round trips through this environment's TPU tunnel
    cost ~20x the step's compute; with the pool resident in HBM the host
    only uploads it once and reads back per-step metrics per epoch.

    Returns epoch_fn(params, opt_state, scene, pool, key, mask_on,
    batch_size, steps, only_coarse) -> (params, opt_state, stacked metrics).
    ``pool`` is a TrainBatch whose leaves hold the WHOLE pool (N_pool, ...).
    """
    import dataclasses

    # inference-only fused kernel off; when spec.trainable_kernel is on
    # (cfg.TPU.TRAINABLE_KERNEL), the hand-differentiated SpaceNet kernel
    # (kernels.spacenet_vjp) carries the training MLP work on TPU
    spec = dataclasses.replace(spec, use_pallas=False,
                               nosort_composite=True)
    edits = EditState.identity(spec.layer_num)

    @functools.partial(jax.jit, static_argnames=("batch_size", "steps",
                                                 "only_coarse"),
                       donate_argnums=(0, 1))
    def epoch(params, opt_state, scene: SceneBoxes, pool: TrainBatch, key,
              mask_on, batch_size: int, steps: int, only_coarse: bool = False):
        n_pool = pool.rgb.shape[0]
        key, pkey = jax.random.split(key)
        order = jax.random.permutation(pkey, n_pool)[:steps * batch_size]
        order = order.reshape(steps, batch_size)

        def body(carry, idx):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            batch = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), pool)

            def loss_fn(p):
                out = render_rays(p, spec, scene, batch.inputs, edits, sub,
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
            return (params, opt_state, key), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            body, (params, opt_state, key), order)
        return params, opt_state, metrics

    return epoch


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
             train_pool: dict, step_fn=None, optimizer=None, *,
             val_fn=None, resume_epoch: int = 0, psnr_thres: float = 100.0,
             seed: int = 0, logger: logging.Logger | None = None,
             swriter=None):
    """Training host loop (ref: engine/layered_trainer.py:133-331).

    ``train_pool`` holds the pregenerated ray arrays {rays, rgbs, labels,
    near_fars}; the whole pool is uploaded to the device once and each epoch
    runs as one scanned device program (see :func:`make_train_epoch`).
    ``val_fn(params, epoch)`` optionally renders validation images.
    ``step_fn`` is accepted for API compatibility but unused.
    """
    from ..models.rays import unpack_rays

    logger = logger or logging.getLogger("stnerf_tpu.train")
    s = cfg.SOLVER
    batch_size = s.IMS_PER_BATCH
    key = jax.random.PRNGKey(seed)
    opt_state = optimizer.init(params)
    epoch_fn = make_train_epoch(spec, optimizer,
                                remove_outliers=cfg.MODEL.REMOVE_OUTLIERS)

    n_pool = train_pool["rays"].shape[0]
    steps = max(n_pool // batch_size, 1)
    pool = TrainBatch(
        inputs=unpack_rays(train_pool["rays"], spec, train_pool["near_fars"]),
        rgb=jnp.asarray(train_pool["rgbs"], jnp.float32),
        labels=jnp.asarray(train_pool["labels"].reshape(-1), jnp.int32))
    pool = jax.device_put(pool)
    logger.info("pool resident on device: %d rays, %d steps/epoch", n_pool, steps)

    for epoch in range(1 + resume_epoch, s.MAX_EPOCHS):
        epoch_start = time.time()
        only_coarse = epoch < s.COARSE_STAGE
        mask_on = jnp.asarray(1.0 if epoch < 3 else 0.0)
        key, ekey = jax.random.split(key)
        params, opt_state, metrics = epoch_fn(params, opt_state, scene, pool,
                                              ekey, mask_on,
                                              batch_size=batch_size,
                                              steps=steps,
                                              only_coarse=only_coarse)
        metrics = jax.device_get(metrics)
        elapsed = time.time() - epoch_start
        rays_per_s = steps * batch_size / max(elapsed, 1e-9)

        for i in range(0, steps, max(s.LOG_PERIOD, 1)):
            global_step = (epoch - 1) * steps + i
            # same line format as the reference
            # (ref: engine/layered_trainer.py:304-306)
            logger.info(
                "Epoch[%d] Iteration[%d/%d] Loss: %.3e  Psnr coarse: %.2f "
                "Psnr fine: %.2f Speed: %.1f[rays/s]",
                epoch, i, steps, float(metrics.loss[i]),
                float(metrics.psnr_coarse[i]), float(metrics.psnr_fine[i]),
                rays_per_s)
            if swriter is not None:
                swriter.add_scalar("Loss/train_loss", float(metrics.loss[i]), global_step)
                swriter.add_scalar("TrainPsnr", float(metrics.psnr_fine[i]), global_step)
                swriter.add_scalar("Loss/mask_loss", float(metrics.mask_loss[i]), global_step)
                swriter.add_scalar("Loss/rgb_loss", float(metrics.rgb_loss[i]), global_step)

        if cfg.OUTPUT_DIR:
            save_checkpoint(cfg.OUTPUT_DIR, params, opt_state, epoch)
        if val_fn is not None:
            val_fn(params, epoch)
        logger.info("Epoch %d done. Time: %.3f[s] Speed: %.1f[rays/s]",
                    epoch, elapsed, rays_per_s)

        mean_psnr = float(np.mean(metrics.psnr_fine))
        if mean_psnr > psnr_thres:
            logger.info("Mean epoch PSNR %.3f > threshold %.3f, stopping", mean_psnr, psnr_thres)
            break
    return params, opt_state
