"""Learnable per-camera pose refinement.

A quaternion (x, y, z, w) + translation per training camera, applied to ray
directions/origins indexed by camera id (ref: layers/camera_transform.py:43-105).
"""

from __future__ import annotations

import jax.numpy as jnp


def init_camera_transform(num_cams: int) -> dict:
    rvec = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (num_cams, 1))
    tvec = jnp.zeros((num_cams, 3))
    return {"rvec": rvec, "tvec": tvec}


def _rot_mats(rvec: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x,y,z,w) rows -> (C, 3, 3) rotation matrices, with the
    reference's soft normalization (ref: layers/camera_transform.py:65-80)."""
    theta = jnp.sqrt(1e-5 + jnp.sum(rvec**2, axis=1))
    q = rvec / theta[:, None]
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack([
        1 - 2 * y**2 - 2 * z**2, 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * x**2 - 2 * z**2, 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (x * w + y * z), 1 - 2 * x**2 - 2 * y**2,
    ], axis=1)
    return r.reshape(-1, 3, 3)


def apply_camera_transform(params: dict, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                           cam_ids: jnp.ndarray):
    """rays_o/rays_d: (N, 3), cam_ids: (N,) int -> refined (rays_o, rays_d)."""
    idx = cam_ids.astype(jnp.int32)
    R = _rot_mats(params["rvec"])[idx]           # (N, 3, 3)
    d = jnp.sum(rays_d[:, None, :] * R, axis=-1)  # row-major contraction, as ref
    o = rays_o + params["tvec"][idx]
    return o, d
