"""Training losses.

* RGB loss: MSE on coarse and fine mixed composites
  (ref: engine/layered_trainer.py:216-217, layers/loss.py:4-5).
* Mask (alpha segmentation) loss: pushes each performer layer's accumulated
  alpha to 0 on rays labeled background and to 1 on rays labeled as that
  layer, active for the first epochs when REMOVE_OUTLIERS is on
  (ref: engine/layered_trainer.py:218-281). The reference's data-dependent
  gating (zero the term unless it exceeds 5e-4 * N) is expressed with
  ``jnp.where`` so the step stays trace-once.
"""

from __future__ import annotations

import jax.numpy as jnp

MASK_LOSS_SCALE = 1e5     # ref: layered_trainer.py:244 (scalar_max)
MASK_LOSS_PENALTY = 1.0   # ref: layered_trainer.py:247
MASK_LOSS_GATE = 0.0005   # ref: layered_trainer.py:264


def rgb_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def mask_alpha_loss(layer_acc: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """layer_acc: (L+1, N, 1) per-layer accumulated alpha, labels: (N,) int
    segmentation id per ray (0 = background). Returns the scaled, gated
    scalar loss."""
    acc = layer_acc[..., 0]                      # (L+1, N)
    lp1, n = acc.shape
    lbl = labels.astype(jnp.int32)
    is_bkgd = (lbl == 0).astype(acc.dtype)       # (N,)

    # outliers: performer layers' alpha on background-labeled rays
    outlier = jnp.sum(jnp.abs(acc[1:]) * is_bkgd[None, :])
    # inliers: each layer's alpha on its own rays (background included)
    layer_ids = jnp.arange(lp1)[:, None]
    own = (lbl[None, :] == layer_ids).astype(acc.dtype)
    inlier = jnp.sum(jnp.abs(1.0 - acc) * own)

    raw = outlier * MASK_LOSS_PENALTY + inlier
    return jnp.where(raw > n * MASK_LOSS_GATE, raw / MASK_LOSS_SCALE, 0.0)
