"""Whole-pose rendering as one device program.

The host uploads only the camera (K, c2w), per-layer frame ids and edit
state (~100 bytes); pixel rays are generated on device, all chunks render
inside one ``lax.map``, and outputs come back quantized (u8 color, f16
depth/alpha). On this environment's tunneled TPU, host<->device bandwidth
is ~3-7 MB/s, so shipping 2M rays up and f32 images down would cost minutes
per frame — this program reduces the transfer to the final images only.

Rays are generated in **screen-tile order** (default 128x256-pixel tiles =
one 32768-ray chunk per tile): each chunk is spatially compact, so the
chunk-level performer-field skip (models.layered._eval_fields_fused) fires
for every tile outside a performer's screen footprint. The host unscrambles
the tile order back into row-major images.
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


def tile_grid(h: int, w: int, chunk: int, tile_cols: int = 256):
    """Static tile geometry: (tile_h, tile_w, tiles_x, tiles_y, n_pad)."""
    tile_w = min(tile_cols, chunk)
    tile_h = chunk // tile_w
    tiles_x = -(-w // tile_w)
    tiles_y = -(-h // tile_h)
    return tile_h, tile_w, tiles_x, tiles_y, tiles_x * tiles_y * chunk


def tile_pixel_coords(h: int, w: int, chunk: int, tile_cols: int = 256):
    """NumPy copy of the device-side tile->pixel mapping, for unscrambling.
    Returns (vs, us) int arrays of length n_pad (coords clamped in-range)."""
    th, tw, tiles_x, _, n_pad = tile_grid(h, w, chunk, tile_cols)
    idx = np.arange(n_pad)
    tile, r = idx // chunk, idx % chunk
    vs = (tile // tiles_x) * th + r // tw
    us = (tile % tiles_x) * tw + r % tw
    return np.minimum(vs, h - 1), np.minimum(us, w - 1), (vs < h) & (us < w)


def _device_tile_rays(K, c2w, h: int, w: int, chunk: int, tile_cols: int):
    """Planar pixel rays in tile order -> (o (3,), dirs (3, n_pad))."""
    th, tw, tiles_x, _, n_pad = tile_grid(h, w, chunk, tile_cols)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
    tile, r = idx // chunk, idx % chunk
    vs = jnp.minimum((tile // tiles_x) * th + r // tw, h - 1).astype(jnp.float32)
    us = jnp.minimum((tile % tiles_x) * tw + r % tw, w - 1).astype(jnp.float32)
    Kinv = jnp.linalg.inv(K)
    x = Kinv[0, 0] * us + Kinv[0, 1] * vs + Kinv[0, 2]
    y = Kinv[1, 1] * vs + Kinv[1, 2]
    z = jnp.ones_like(us)
    norm = jax.lax.rsqrt(x * x + y * y + z * z)
    cam = jnp.stack([x * norm, y * norm, z * norm], axis=0)   # (3, n_pad)
    # HIGHEST: this one matmul defines every rendered ray's direction;
    # default bf16 MXU precision would bend rays by ~2^-8 rel
    dirs = jnp.matmul(c2w[:3, :3], cam, precision=jax.lax.Precision.HIGHEST)
    return c2w[:3, 3], dirs


@functools.partial(jax.jit,
                   static_argnames=("spec", "h", "w", "chunk", "tile_cols",
                                    "only_coarse", "shard_data",
                                    "layer_outputs"))
def render_pose_on_device(params, spec: LayeredSpec, scene: SceneBoxes,
                          K, c2w, frame_ids, near_far, edits: EditState,
                          *, h: int, w: int, chunk: int = 32768,
                          tile_cols: int = 256, key=None,
                          only_coarse: bool = False,
                          shard_data: bool = False,
                          layer_outputs: tuple | None = None) -> QuantizedFrame:
    """Render a full pose. K (3,3), c2w (4,4), frame_ids (L+1,) float,
    near_far (2,). Returns quantized per-pixel outputs in TILE order
    (use :func:`tile_pixel_coords` to unscramble).

    ``shard_data``: constrain each chunk's ray axis to the mesh's ``data``
    axis (call under ``jax.sharding.set_mesh``) — multi-chip rendering with
    replicated parameters and zero collectives in the forward pass.

    ``layer_outputs`` (static tuple of layer ids, or None for all): layers
    whose per-layer fine composites are computed; the rest come back as
    zero images without paying their compositing work (the shared field
    evaluations still run — see models.layered.render_rays)."""
    _, _, _, _, n_pad = tile_grid(h, w, chunk, tile_cols)
    n_chunks = n_pad // chunk

    o, dirs = _device_tile_rays(K, c2w, h, w, chunk, tile_cols)
    dirs = dirs.reshape(3, n_chunks, chunk)
    if shard_data:
        from jax.sharding import PartitionSpec as P

        from ..parallel import DATA_AXIS

        dirs = jax.lax.with_sharding_constraint(dirs, P(None, None, DATA_AXIS))

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
                          None if key is None else k, only_coarse=only_coarse,
                          layer_outputs=layer_outputs)

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
            return jnp.moveaxis(x, 1, 0).reshape(lp1, n_pad, *x.shape[3:])
        return x.reshape(n_pad, *x.shape[2:])

    return jax.tree.map(fix, out)


def render_pose_host(params, spec, scene, K, c2w, frame_ids, near_far, edits,
                     h, w, chunk=32768, tile_cols=256, key=None,
                     far_clip=20.0, mesh=None, timings=None,
                     download_layers=None):
    """Host-facing wrapper -> (color (H,W,3), depth (H,W,1),
    color_layer list, depth_layer list), images in [0,1]. With ``mesh``,
    rays shard across the mesh's ``data`` axis.

    ``timings`` (optional dict) receives ``device_s`` / ``download_s`` for
    this pose: device execution is fenced with a scalar-reduction
    ``device_get`` (``block_until_ready`` does not block through the
    tunneled TPU), then the image download is timed separately — the split
    a tunnel-hosted drive needs to report honest device throughput.

    ``download_layers`` (optional list of layer ids) limits the per-layer
    work to those layers, twice over: the device program skips the other
    layers' fine compositing entirely (static ``layer_outputs`` in
    :func:`render_pose_on_device`), and the per-layer image download skips
    them too — a drive with hidden performers never saves their images,
    and at 1080p each skipped layer is ~10 MB/pose through the ~3-7 MB/s
    tunnel. Skipped layers return zero images (same list shape); the mixed
    color/depth always download."""
    import contextlib
    import time

    lp1_spec = spec.layer_num + 1
    lo = (None if download_layers is None else tuple(sorted(
        {int(i) for i in download_layers if 0 <= int(i) < lp1_spec})))
    ctx = jax.sharding.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    t0 = time.time()
    with ctx:
        out = render_pose_on_device(
            params, spec, scene,
            jnp.asarray(K, jnp.float32), jnp.asarray(c2w, jnp.float32),
            jnp.asarray(frame_ids, jnp.float32), jnp.asarray(near_far, jnp.float32),
            edits, h=h, w=w, chunk=chunk, tile_cols=tile_cols, key=key,
            shard_data=mesh is not None, layer_outputs=lo)
    if timings is not None:
        float(jax.device_get(jnp.sum(out.depth.astype(jnp.float32))))
        timings["device_s"] = time.time() - t0
        t0 = time.time()
    lp1 = int(out.layer_color.shape[0])
    if download_layers is None:
        dl = list(range(lp1))
    else:
        dl = sorted({int(i) for i in download_layers if 0 <= int(i) < lp1})
    lc, ld = out.layer_color, out.layer_depth
    if len(dl) < lp1:
        # one gather (compiled once per shape) -> one smaller download
        idx = jnp.asarray(dl, jnp.int32)
        lc, ld = lc[idx], ld[idx]
    # download ONLY the leaves this wrapper returns: acc/layer_acc stay on
    # device (~16 MB/pose at 1080p that the ~3-7 MB/s tunnel never pays for)
    color_q, depth_q, lcolor_q, ldepth_q = jax.device_get(
        (out.color, out.depth, lc, ld))
    if timings is not None:
        timings["download_s"] = time.time() - t0
    vs, us, valid = tile_pixel_coords(h, w, chunk, tile_cols)

    def unscramble(flat, channels):
        img = np.zeros((h, w, channels), flat.dtype)
        img[vs[valid], us[valid]] = flat[valid].reshape(-1, channels)
        return img

    color = unscramble(color_q, 3).astype(np.float32) / 255.0
    depth = np.clip(unscramble(depth_q[:, None], 1).astype(np.float32),
                    0, None) / far_clip
    pos = {layer: k for k, layer in enumerate(dl)}
    color_layer = [
        unscramble(lcolor_q[pos[i]], 3).astype(np.float32) / 255.0
        if i in pos else np.zeros((h, w, 3), np.float32)
        for i in range(lp1)]
    depth_layer = [
        np.clip(unscramble(ldepth_q[pos[i]][:, None], 1)
                .astype(np.float32), 0, None) / far_clip
        if i in pos else np.zeros((h, w, 1), np.float32)
        for i in range(lp1)]
    return color, depth, color_layer, depth_layer
