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


def make_warmup_multistep(base_lr: float, milestones, gamma: float = 0.1,
                          warmup_factor: float = 1.0 / 3,
                          warmup_iters: int = 500,
                          warmup_method: str = "linear"):
    """Warmup + multistep gamma decay, identical to the reference's
    WarmupMultiStepLR (ref: solver/lr_scheduler.py:12-55): during warmup the
    factor ramps from ``warmup_factor`` to 1 (or stays constant), and the lr
    is multiplied by ``gamma`` after each milestone step
    (``bisect_right`` ≡ the count of milestones <= step)."""
    if list(milestones) != sorted(milestones):
        raise ValueError(f"milestones must be increasing, got {milestones}")
    if warmup_method not in ("constant", "linear"):
        raise ValueError(f"warmup_method must be constant|linear, got {warmup_method}")
    ms = jnp.asarray(list(milestones), jnp.float32)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(s < warmup_iters, warmup_factor, 1.0)
        else:
            alpha = s / max(warmup_iters, 1)
            wf = jnp.where(s < warmup_iters,
                           warmup_factor * (1.0 - alpha) + alpha, 1.0)
        k = jnp.sum(ms <= s)
        return base_lr * wf * gamma ** k

    return schedule


def make_frozen_mask(params: dict, frozen_groups) -> dict | None:
    """Bool mask pytree (prefix) from top-level param-group names.

    ``frozen_groups`` lists keys of the parameter pytree ("bkgd_coarse",
    "layers_fine", "motion", "cam_pose", ...) whose leaves receive zero
    updates — the config surface for the reference's frozen/active Adam
    param groups (ref: solver/build.py:20-22). Returns None when nothing is
    frozen (no optimizer-state overhead). Unknown names raise: a typo that
    silently trained a "frozen" net would be worse than a crash."""
    groups = list(frozen_groups or [])
    if not groups:
        return None
    unknown = [g for g in groups if g not in params]
    if unknown:
        raise ValueError(f"unknown frozen param groups {unknown}; "
                         f"available: {sorted(params)}")
    return {k: k in groups for k in params}


def make_optimizer(cfg, frozen_mask=None) -> optax.GradientTransformation:
    """``frozen_mask``: optional pytree of bools matching the param tree;
    True leaves receive zero updates — the reference's frozen/active param
    groups, which set lr=0 on the frozen group (ref: solver/build.py:20-22)."""
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
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx
