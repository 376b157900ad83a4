"""Whole-pose rendering as one device program.

The host uploads only the camera (K, c2w), per-layer frame ids and edit
state (~100 bytes); pixel rays are generated on device, all chunks render
inside one ``lax.map``, and outputs come back quantized (u8 color, f16
depth/alpha). On this environment's tunneled TPU, host<->device bandwidth
is ~3-7 MB/s, so shipping 2M rays up and f32 images down would cost minutes
per frame — this program reduces the transfer to the final images only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import EditState, RayInputs, SceneBoxes, render_rays
from ..models.layered import LayeredSpec


class QuantizedFrame(NamedTuple):
    color: jnp.ndarray         # (N, 3) u8
    depth: jnp.ndarray         # (N,) f16 (raw expected depth)
    acc: jnp.ndarray           # (N,) f16
    layer_color: jnp.ndarray   # (L+1, N, 3) u8
    layer_depth: jnp.ndarray   # (L+1, N) f16
    layer_acc: jnp.ndarray     # (L+1, N) f16


def _device_pixel_rays(K, c2w, h: int, w: int):
    """Planar pixel rays on device: -> (o (3,), dirs (3, h*w))."""
    vs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    us = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    Kinv = jnp.linalg.inv(K)
    x = Kinv[0, 0] * us + Kinv[0, 1] * vs + Kinv[0, 2]
    y = Kinv[1, 1] * vs + Kinv[1, 2]
    z = jnp.ones_like(us)
    norm = jax.lax.rsqrt(x * x + y * y + z * z)
    cam = jnp.stack([x * norm, y * norm, z * norm], axis=0)   # (3, N)
    dirs = c2w[:3, :3] @ cam
    return c2w[:3, 3], dirs


@functools.partial(jax.jit,
                   static_argnames=("spec", "h", "w", "chunk", "only_coarse"))
def render_pose_on_device(params, spec: LayeredSpec, scene: SceneBoxes,
                          K, c2w, frame_ids, near_far, edits: EditState,
                          *, h: int, w: int, chunk: int = 32768,
                          key=None, only_coarse: bool = False) -> QuantizedFrame:
    """Render a full pose. K (3,3), c2w (4,4), frame_ids (L+1,) float,
    near_far (2,). Returns quantized per-pixel outputs (row-major)."""
    n = h * w
    n_pad = ((n + chunk - 1) // chunk) * chunk
    n_chunks = n_pad // chunk

    o, dirs = _device_pixel_rays(K, c2w, h, w)
    dirs = jnp.pad(dirs, ((0, 0), (0, n_pad - n)), mode="edge")
    dirs = dirs.reshape(3, n_chunks, chunk)

    keys = (jax.random.split(key, n_chunks) if key is not None
            else jnp.zeros((n_chunks, 2), jnp.uint32))

    def one(args):
        d_c, k = args
        inputs = RayInputs(
            rays_o=jnp.broadcast_to(o, (chunk, 3)),
            rays_d=d_c.T,
            frame_ids=jnp.broadcast_to(frame_ids, (chunk, frame_ids.shape[0])),
            cam_ids=jnp.zeros((chunk,), jnp.float32),
            near_far=jnp.broadcast_to(near_far, (chunk, 2)))
        out = render_rays(params, spec, scene, inputs, edits,
                          None if key is None else k, only_coarse=only_coarse)

        def q8(c):
            return (jnp.clip(c, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

        return QuantizedFrame(
            q8(out.fine.color), out.fine.depth[:, 0].astype(jnp.float16),
            out.fine.acc[:, 0].astype(jnp.float16),
            q8(out.fine_layers.color), out.fine_layers.depth[..., 0].astype(jnp.float16),
            out.fine_layers.acc[..., 0].astype(jnp.float16))

    out = jax.lax.map(one, (jnp.moveaxis(dirs, 0, 1), keys))

    lp1 = spec.layer_num + 1

    def fix(x):
        if x.ndim >= 2 and x.shape[1] == lp1:
            y = jnp.moveaxis(x, 1, 0).reshape(lp1, n_pad, *x.shape[3:])
            return y[:, :n]
        return x.reshape(n_pad, *x.shape[2:])[:n]

    return jax.tree.map(fix, out)


def render_pose_host(params, spec, scene, K, c2w, frame_ids, near_far, edits,
                     h, w, chunk=32768, key=None, far_clip=20.0):
    """Host-facing wrapper -> numpy dict of images (H, W, C) in [0,1]."""
    out = render_pose_on_device(
        params, spec, scene,
        jnp.asarray(K, jnp.float32), jnp.asarray(c2w, jnp.float32),
        jnp.asarray(frame_ids, jnp.float32), jnp.asarray(near_far, jnp.float32),
        edits, h=h, w=w, chunk=chunk, key=key)
    out = jax.device_get(out)
    color = out.color.reshape(h, w, 3).astype(np.float32) / 255.0
    depth = np.clip(out.depth.reshape(h, w, 1).astype(np.float32), 0, None) / far_clip
    lp1 = out.layer_color.shape[0]
    color_layer = [out.layer_color[i].reshape(h, w, 3).astype(np.float32) / 255.0
                   for i in range(lp1)]
    depth_layer = [np.clip(out.layer_depth[i].reshape(h, w, 1).astype(np.float32),
                           0, None) / far_clip for i in range(lp1)]
    return color, depth, color_layer, depth_layer
