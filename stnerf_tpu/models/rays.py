"""Packed-ray compatibility shim.

The reference carries camera/frame ids as extra ray columns whose meaning
depends on runtime flags (ref: modeling/layered_rfrender.py:144-181 and
data/datasets/ray_dataset.py:405-418, 276-281). The TPU core uses an explicit
``RayInputs`` struct instead; these helpers translate between the two so the
reference's data layout (cached ray tensors, demo call signatures) keeps
working unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .layered import LayeredSpec, RayInputs


def unpack_rays(rays, spec: LayeredSpec, near_far=None) -> RayInputs:
    """Decode a packed ray tensor into RayInputs.

    Layouts handled (K = rays.shape[-1]):
      * pose_refinement prefix: [o(3), cam, d(3), cam]     8 wide
        (ref: data/datasets/ray_dataset.py:407-410), id columns follow it
      * base [o, d] (+ cam col) (+ frame col)              K = 6 / 7 / 8
      * retiming: prefix (+ cam) + (L+1) per-layer frame ids (ref: :276-281)
    """
    rays = jnp.asarray(rays, jnp.float32)
    n, k = rays.shape
    L = spec.layer_num
    lp1 = L + 1

    cam_ids = jnp.zeros((n,), jnp.float32)
    frame_ids = jnp.ones((n, lp1), jnp.float32)

    if spec.pose_refinement:
        # always the 8-wide prefix; flag columns (deform-view cam id,
        # frame ids) come after column 8 (data/raygen._append_id_columns)
        o, d = rays[:, 0:3], rays[:, 4:7]
        cam_ids = rays[:, 3]
        col = 8
    else:
        o, d = rays[:, 0:3], rays[:, 3:6]
        col = 6
    if spec.use_deform_view:
        cam_ids = rays[:, col]
        col += 1
    if spec.use_deform_time or spec.use_space_time:
        rest = k - col
        if rest == 1:
            frame_ids = jnp.tile(rays[:, col:col + 1], (1, lp1))
        elif rest == lp1:
            frame_ids = rays[:, col:col + lp1]
        else:
            raise ValueError(f"undefined ray format: width {k}")
    elif k != col:
        raise ValueError(f"undefined ray format: width {k}")

    if near_far is None:
        near_far = jnp.tile(jnp.array([[0.0, 1.0]], jnp.float32), (n, 1))
    else:
        near_far = jnp.asarray(near_far, jnp.float32).reshape(n, 2)
    return RayInputs(o, d, frame_ids, cam_ids, near_far)


def pack_rays(inputs: RayInputs, spec: LayeredSpec, retiming: bool = False) -> np.ndarray:
    """Inverse of :func:`unpack_rays` (reference cache layout)."""
    o, d = np.asarray(inputs.rays_o), np.asarray(inputs.rays_d)
    cam = np.asarray(inputs.cam_ids)[:, None]
    if spec.pose_refinement:
        cols = [o, cam, d, cam]  # ref: ray_dataset.py:407-410
    else:
        cols = [o, d]
    if spec.use_deform_view:
        cols.append(cam)
    if spec.use_deform_time or spec.use_space_time:
        f = np.asarray(inputs.frame_ids)
        cols.append(f if retiming else f[:, :1])
    return np.concatenate(cols, axis=1).astype(np.float32)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad with edge replication up to a multiple (static-shape chunking)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad, mode="edge"), n
