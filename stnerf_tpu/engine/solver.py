"""Optimizer and learning-rate schedule (optax).

Replaces the reference's solver package (ref: solver/build.py:10-26 Adam;
solver/lr_scheduler.py:57-69 per-iteration LambdaLR: linear warmup over
WARMUP_ITERS, then from START_ITERS an exponential decay onto the LR_SCALE
floor by END_ITERS). Weight decay matches torch Adam's L2-into-gradient
behavior (decay added before the moment estimates).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_lr_schedule(base_lr: float, warmup_iters: int, start_iters: int,
                     end_iters: int, lr_scale: float):
    """Per-step multiplier identical to ref solver/lr_scheduler.py:59-69."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        warm = s / max(warmup_iters, 1)
        decay = (1.0 - lr_scale) * jnp.exp(-(s - start_iters) /
                                           (end_iters - start_iters)) + lr_scale
        mult = jnp.where(s <= warmup_iters, warm,
                         jnp.where(s >= start_iters, decay, 1.0))
        return base_lr * mult

    return schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    s = cfg.SOLVER
    sched = make_lr_schedule(s.BASE_LR, s.WARMUP_ITERS, s.START_ITERS,
                             s.END_ITERS, s.LR_SCALE)
    chain = []
    if s.WEIGHT_DECAY:
        chain.append(optax.add_decayed_weights(s.WEIGHT_DECAY))
    if s.OPTIMIZER_NAME.lower() == "adam":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
    elif s.OPTIMIZER_NAME.lower() == "sgd":
        if s.MOMENTUM:
            chain.append(optax.trace(decay=s.MOMENTUM))
    else:
        raise ValueError(f"unknown optimizer {s.OPTIMIZER_NAME}")
    chain.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*chain)
