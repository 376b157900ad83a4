"""Image quality metrics in JAX (ref: utils/metrics.py:4-24, which used
torch + kornia; SSIM is implemented directly here)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def mae(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(mse(pred, gt))


def _gaussian_kernel(size: int, sigma: float, dtype) -> jnp.ndarray:
    x = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def ssim(pred: jnp.ndarray, gt: jnp.ndarray, window: int = 3,
         max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over an image. pred/gt: (H, W, C) in [0, max_val].

    The reference reports ``1 - 2 * dssim`` with kornia's window-3 dssim
    (ref: utils/metrics.py:19-24), which equals plain mean SSIM; we compute
    SSIM directly with a gaussian window (sigma = 1.5).
    """
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    k = _gaussian_kernel(window, 1.5, pred.dtype)
    kern2d = jnp.outer(k, k)[:, :, None, None]  # (w, w, 1, 1)

    def filt(img):
        # depthwise 2-D convolution, valid padding
        img4 = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
        # HIGHEST precision: TPU convs default to bf16 inputs, and the
        # variance terms (filt(x^2) - mu^2) cancel catastrophically —
        # bf16 noise makes denominators near-zero and SSIM lands far
        # outside [-1, 1] on smooth renders.
        out = jax.lax.conv_general_dilated(
            img4, jnp.moveaxis(kern2d, (0, 1, 2, 3), (2, 3, 1, 0)),
            window_strides=(1, 1), padding="VALID",
            precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(out[:, 0], 0, -1)

    mu_p, mu_g = filt(pred), filt(gt)
    sig_p = filt(pred * pred) - mu_p**2
    sig_g = filt(gt * gt) - mu_g**2
    sig_pg = filt(pred * gt) - mu_p * mu_g
    num = (2 * mu_p * mu_g + c1) * (2 * sig_pg + c2)
    den = (mu_p**2 + mu_g**2 + c1) * (sig_p + sig_g + c2)
    return jnp.mean(num / den)
