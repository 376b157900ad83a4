"""Checkpoint save/load/discovery.

Native format: a pickle of numpy-ified pytrees
(``layered_rfnr_checkpoint_{epoch}[_{step}].ckpt``) holding params, optimizer
state and progress counters — the orbax-free equivalent of the reference's
``torch.save({'model','optimizer','scheduler'})``
(ref: engine/layered_trainer.py:342-354). Discovery-by-newest mirrors
``get_iteration_path`` (ref: data/datasets/utils.py:42-77) and also finds
reference ``.pt`` files so pretrained scenes load transparently via the
state-dict importer.
"""

from __future__ import annotations

import glob
import os
import pickle
import re

import jax
import numpy as np

_STEM = "layered_rfnr_checkpoint"


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(output_dir: str, params, opt_state, epoch: int,
                    step: int | None = None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    name = f"{_STEM}_{epoch}.ckpt" if step is None else f"{_STEM}_{epoch}_{step}.ckpt"
    path = os.path.join(output_dir, name)
    blob = {"params": _to_numpy(params), "opt_state": _to_numpy(opt_state),
            "epoch": epoch, "step": step or 0, "format": "stnerf_tpu.v1"}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f, protocol=4)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(output_dir: str):
    """Newest checkpoint path by (epoch, step), or None. Accepts both our
    ``.ckpt`` and reference ``.pt`` files."""
    if not os.path.isdir(output_dir):
        return None
    best, best_key = None, (-1, -1)
    for path in glob.glob(os.path.join(output_dir, f"{_STEM}_*")):
        m = re.match(rf"{_STEM}_(\d+)(?:_(\d+))?\.(ckpt|pt)$", os.path.basename(path))
        if not m:
            continue
        key = (int(m.group(1)), int(m.group(2) or 0))
        if key > best_key:
            best, best_key = path, key
    return best


def load_params_any(path: str, spec):
    """Load parameters from either a native ``.ckpt`` or a reference ``.pt``."""
    if path.endswith(".pt"):
        from ..models.io_torch import load_reference_checkpoint
        return load_reference_checkpoint(path, spec)
    return load_checkpoint(path)["params"]


def export_reference_checkpoint(path: str, params, spec) -> str:
    """Write a torch-loadable ``.pt`` with the reference's key layout so
    TPU-trained scenes can be consumed by the original code base."""
    import torch

    from ..models.io_torch import state_dict_from_params

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in state_dict_from_params(_to_numpy(params), spec).items()}
    torch.save({"model": sd}, path)
    return path
