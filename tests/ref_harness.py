"""Harness for A/B parity runs against the reference implementation's OWN
code (/root/reference, torch CPU).

The reference's pretrained checkpoints were stripped from this mirror
(.MISSING_LARGE_BLOBS), so checkpoint-parity is proven the other way
around: export OUR parameters through the reference state-dict layout
(models/io_torch.state_dict_from_params), load them into the reference's
``LayeredRFRender`` (ref: modeling/layered_rfrender.py:19-735), render the
same rays deterministically on both sides and require PSNR >= 40 dB.

Import shims (the reference environment lacks yacs/CUDA):
* ``yacs.config.CfgNode`` -> our dependency-free yacs-compatible CfgNode,
* ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` -> identity (CPU torch).

Determinism shims (the reference jitters with torch.rand and has no det
switch in its coarse samplers):
* ``torch.rand`` -> 0.5 (bin centers) == our samplers' ``key=None`` mode,
* ``modeling.layered_rfrender.sample_pdf`` -> det=True (u = linspace)
  == our ``ops.sampling.sample_pdf(key=None)``.
"""

from __future__ import annotations

import functools
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


def load_reference():
    """Import the reference modeling stack (cached). Returns the
    ``modeling.layered_rfrender`` module."""
    if "modeling.layered_rfrender" in sys.modules:
        return sys.modules["modeling.layered_rfrender"]

    import torch

    from stnerf_tpu.config.node import CfgNode

    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import modeling.layered_rfrender as lrf  # noqa: F401

    # the reference leaves anomaly detection on at import time
    # (ref: layers/camera_transform.py:2, utils/sample_pdf.py:15) — turn it
    # off so the A/B forward is not 10x slower
    torch.autograd.set_detect_anomaly(False)
    return lrf


def make_ref_cfg(cfg):
    """Reference config (its own defaults schema) mirroring ours."""
    load_reference()
    import config as ref_config

    rc = ref_config.cfg.clone()
    m, rm = cfg.MODEL, rc.MODEL
    for k in ("COARSE_RAY_SAMPLING", "FINE_RAY_SAMPLING", "SAMPLE_METHOD",
              "BOARDER_WEIGHT", "SAME_SPACENET", "TKERNEL_INC_RAW",
              "POSE_REFINEMENT", "USE_DIR", "USE_DEFORM_VIEW",
              "USE_DEFORM_TIME", "USE_SPACE_TIME", "BKGD_USE_DEFORM_TIME",
              "BKGD_USE_SPACE_TIME", "DEEP_RGB"):
        rm[k] = m[k]
    rc.DATASETS.LAYER_NUM = cfg.DATASETS.LAYER_NUM
    return rc


def corners_from_minmax(mn, mx) -> np.ndarray:
    """AABB min/max -> the reference's 8-corner layout (0-3 bottom z, 4-7
    top z; ref: data/datasets/frame_dataset.py:62-63)."""
    mn = np.asarray(mn, np.float32)
    mx = np.asarray(mx, np.float32)
    return np.array([
        [mn[0], mn[1], mn[2]], [mx[0], mn[1], mn[2]],
        [mx[0], mx[1], mn[2]], [mn[0], mx[1], mn[2]],
        [mn[0], mn[1], mx[2]], [mx[0], mn[1], mx[2]],
        [mx[0], mx[1], mx[2]], [mn[0], mx[1], mx[2]]], np.float32)


def build_ref_model(cfg, params, spec, scene, camera_num=1, scale=None,
                    shift=None):
    """Reference LayeredRFRender with OUR parameters and OUR scene boxes."""
    import torch

    lrf = load_reference()
    from stnerf_tpu.models.io_torch import state_dict_from_params

    rc = make_ref_cfg(cfg)
    model = lrf.LayeredRFRender(rc, camera_num, scale=scale, shift=shift)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in state_dict_from_params(params, spec).items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected}"
    # cam_pose may legitimately be absent when POSE_REFINEMENT is off
    assert all("cam_pose" in k for k in missing), f"missing keys: {missing}"
    model.eval()

    boxes = np.asarray(scene.boxes)  # (F, L, 2, 3) min/max
    F, L = boxes.shape[:2]
    corners = np.stack([
        np.stack([corners_from_minmax(boxes[f, l, 0], boxes[f, l, 1])
                  for l in range(L)]) for f in range(F)])
    model.set_bboxes(torch.from_numpy(corners))
    model.set_bkgd_bbox(torch.from_numpy(
        corners_from_minmax(np.asarray(scene.bkgd_box)[0],
                            np.asarray(scene.bkgd_box)[1])))
    return model


class deterministic_ref:
    """Context manager pinning the reference's RNG draws to our ``key=None``
    deterministic modes: torch.rand -> 0.5, sample_pdf -> det."""

    def __enter__(self):
        import torch

        lrf = load_reference()
        self._rand = torch.rand
        self._pdf = lrf.sample_pdf

        def rand_half(*size, device=None, **kw):
            if len(size) == 1 and isinstance(size[0], (tuple, list, torch.Size)):
                size = tuple(size[0])
            return torch.full(size, 0.5, device=device)

        torch.rand = rand_half
        lrf.sample_pdf = functools.partial(self._pdf, det=True)
        return self

    def __exit__(self, *exc):
        import torch

        lrf = load_reference()
        torch.rand = self._rand
        lrf.sample_pdf = self._pdf
        return False


def run_ref_forward(model, rays: np.ndarray, only_coarse=False,
                    density_threshold=0.0, bkgd_density_threshold=0.0):
    """Deterministic reference forward on packed rays. Returns dict of
    numpy outputs {fine/coarse: (color, depth, acc), layers...}."""
    import torch

    with deterministic_ref(), torch.no_grad():
        labels = torch.zeros(rays.shape[0], 1)
        fine, coarse, fine_layers, coarse_layers, ray_mask = model(
            torch.from_numpy(rays), labels, None, only_coarse=only_coarse,
            density_threshold=density_threshold,
            bkgd_density_threshold=bkgd_density_threshold)
    out = {
        "fine": tuple(np.asarray(t) for t in fine),
        "coarse": tuple(np.asarray(t) for t in coarse),
        "fine_layers": [tuple(np.asarray(t) for t in lay) for lay in fine_layers],
        "coarse_layers": [tuple(np.asarray(t) for t in lay) for lay in coarse_layers],
        "ray_mask": [np.asarray(m) for m in ray_mask] if ray_mask is not None else None,
    }
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))
