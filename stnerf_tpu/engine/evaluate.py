"""Validation rendering and metric sweeps.

Counterpart of the reference's evaluator/do_evaluate
(ref: engine/layered_trainer.py:17-130 TensorBoard image panels;
:357-421 MAE/PSNR/SSIM sweep over fixed views).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..models import EditState
from ..ops.metrics import mae as mae_fn, psnr as psnr_fn, ssim as ssim_fn
from ..render.chunked import render_rays_chunked


def _norm01(x):
    lo, hi = x.min(), x.max()
    return (x - lo) / max(hi - lo, 1e-8)


def render_view(params, spec, scene, inputs, H, W, chunk=8192):
    # Validation measures the EXACT model semantics: the inference
    # approximations (fast fine stage, early-exit march — production
    # defaults in TPU.*) are stripped here because mid-training coarse and
    # fine nets disagree, which would fold approximation error into the
    # quality metric the trainer reports.
    spec = dataclasses.replace(spec, fast_fine=False, coarse_exit_segments=0)
    out = render_rays_chunked(params, spec, scene, inputs,
                              EditState.identity(spec.layer_num), chunk=chunk)
    color = np.asarray(out.fine.color).reshape(H, W, 3)
    return color, out


def make_val_fn(cfg, spec, scene, view_scene, logger, swriter=None):
    """Build the periodic-validation callback used by do_train: renders one
    labeled view, logs PSNR and (optionally) TensorBoard image panels."""
    rng = np.random.default_rng(123)

    def val_fn(params, epoch):
        inputs, rgbs, labels, image, view, frame = view_scene.get_random_image(rng)
        _, H, W = image.shape
        color, out = render_view(params, spec, scene, inputs, H, W,
                                 chunk=cfg.TPU.RENDER_CHUNK)
        gt = np.moveaxis(image, 0, -1)
        val_psnr = float(psnr_fn(color, gt))
        logger.info("Validation - Epoch %d view %d frame %d PSNR %.2f",
                    epoch, view, frame, val_psnr)
        if swriter is not None:
            swriter.add_scalar("Val/psnr", val_psnr, epoch)
            swriter.add_image("GT/Image", np.moveaxis(gt, -1, 0), epoch)
            swriter.add_image("stage2/rendered", np.moveaxis(color, -1, 0), epoch)
            depth = np.asarray(out.fine.depth).reshape(H, W, 1)
            swriter.add_image("stage2/depth", _norm01(depth)[None, ..., 0], epoch)
            acc = np.asarray(out.fine.acc).reshape(H, W, 1)
            swriter.add_image("stage2/alpha", acc[None, ..., 0], epoch)
            for i in range(spec.layer_num + 1):
                li = np.asarray(out.fine_layers.color[i]).reshape(H, W, 3)
                tag = "stage2_bkgd" if i == 0 else f"stage2_layer{i}"
                swriter.add_image(f"{tag}/rendered", np.moveaxis(li, -1, 0), epoch)
        return val_psnr

    return val_fn


def do_evaluate(params, spec, scene, view_scene, views, frames,
                chunk=8192, save_dir=None):
    """Metric sweep over (view, frame) pairs -> dict of mean MAE/PSNR/SSIM
    (ref: engine/layered_trainer.py:357-421)."""
    maes, psnrs, ssims = [], [], []
    for v in views:
        for f in frames:
            inputs, rgbs, labels, image = view_scene.get_fixed_image(v, f)
            _, H, W = image.shape
            color, _ = render_view(params, spec, scene, inputs, H, W, chunk)
            gt = np.moveaxis(image, 0, -1)
            maes.append(float(mae_fn(color, gt)))
            psnrs.append(float(psnr_fn(color, gt)))
            ssims.append(float(ssim_fn(color, gt)))
            if save_dir:
                import os

                from ..render.video import write_image
                os.makedirs(save_dir, exist_ok=True)
                write_image(os.path.join(save_dir, f"v{v}_f{f}.png"), color)
    result = {"mae": float(np.mean(maes)), "psnr": float(np.mean(psnrs)),
              "ssim": float(np.mean(ssims)), "per_view_psnr": psnrs}
    if save_dir:
        import json
        import os
        with open(os.path.join(save_dir, "metrics.json"), "w") as fh:
            json.dump(result, fh, indent=2)
    return result
