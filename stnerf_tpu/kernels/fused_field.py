"""Fully-fused field evaluation: deformation + encodings + radiance MLP in
one Pallas kernel.

Per sample tile, entirely in VMEM:
  1. MotionNet: positional-encode (xyz, frame-id) — with the reference's
     floor/ceil encoding blend for fractional ids
     (ref: modeling/motion_net.py:49-62) — run the flow MLP, displace xyz
     (ref: modeling/layered_rfrender.py:340-368),
  2. SpaceNet: positional-encode the displaced xyz, run trunk + heads
     (ref: modeling/spacenet.py:101-160).

Compared to the staged path (XLA encodes -> kernel MLP -> XLA motion), this
removes every intermediate HBM tensor: the motion encoding (~85 rows x M),
the flow, the displaced positions and the position encoding (~63 x M) never
leave the chip, and the trig VPU work interleaves with MXU matmuls. Inputs
are just raw planar xyz (3, M), ids (1, M) and the per-ray direction
encoding broadcast (dir_dim, M).

Weights for both nets stay VMEM-resident (~1.2 MB bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_spacenet import _mmT


def prepare_motion_params_planar(params: dict, dtype=jnp.bfloat16):
    """MotionNet pytree -> flat operand tuple (w, b(out,1)) x 6."""
    ops = []
    for layer in params["net"]:
        ops.append(layer["w"].astype(dtype))
        ops.append(layer["b"].astype(jnp.float32)[:, None])
    return tuple(ops)


def _encode(v, num_freqs, include_input):
    """In-kernel planar positional encoding: v (C, tile) -> (C*(1+2L), tile).

    ``sin/cos(2^k x)`` by double-angle recursion from one sin/cos pair:
    3 VPU multiplies per octave instead of 2 polynomial transcendentals —
    the trig was ~35% of the fused kernel's runtime. Recursion error in f32
    (~2^L * eps) stays far below the bf16 quantization the MLP applies."""
    pieces = [v] if include_input else []
    s, c = jnp.sin(v), jnp.cos(v)
    pieces += [s, c]
    for _ in range(num_freqs - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        pieces += [s, c]
    return jnp.concatenate(pieces, axis=0)


def _kernel(cfg, *all_refs):
    (motion_mode, use_time, n_rgb, freqs, inc, dtype, has_flags) = cfg
    if has_flags:
        flags_ref, *all_refs = all_refs
        out_ref = all_refs[-1]

        @pl.when(flags_ref[pl.program_id(0)] != 0)
        def _():
            _kernel_body(cfg, *all_refs)

        @pl.when(flags_ref[pl.program_id(0)] == 0)
        def _():
            # skipped tile: downstream hit-masking zeroes these rays'
            # sigma, but the outputs must still be finite (0 * NaN = NaN)
            out_ref[...] = jnp.zeros_like(out_ref)
    else:
        _kernel_body(cfg, *all_refs)


def _kernel_body(cfg, xyz_ref, id_ref, dir_ref, *refs):
    (motion_mode, use_time, n_rgb, freqs, inc, dtype, _) = cfg
    relu = jax.nn.relu
    n_motion = 12 if motion_mode else 0
    m_ops = refs[:n_motion]
    (w1, b1, w2, b2, w3, b3, w4, b4,
     s2a, s2b, sb1, s2w2, sb2, s2w3, sb3,
     dw, db, r1a, r1b, r1c, rb1, *rest_and_out) = refs[n_motion:]
    *rgb_rest, out_ref = rest_and_out

    xyz = xyz_ref[...]                                   # (3, tile) f32
    ids = id_ref[...]                                    # (1, tile) f32

    if motion_mode:
        if motion_mode == "lerp":
            lo = jnp.floor(ids)
            w = ids - lo
            e_lo = _encode(jnp.concatenate([xyz, lo], axis=0), freqs, inc)
            e_hi = _encode(jnp.concatenate([xyz, lo + 1.0], axis=0), freqs, inc)
            enc = (1.0 - w) * e_lo + w * e_hi
        else:  # direct
            enc = _encode(jnp.concatenate([xyz, ids], axis=0), freqs, inc)
        h = enc.astype(dtype)
        for k in range(6):
            h = _mmT(m_ops[2 * k][...], h, m_ops[2 * k + 1][...])
            if k < 5:
                h = relu(h).astype(dtype)
        xyz = xyz + h                                    # flow displacement

    p = _encode(xyz, freqs, inc).astype(dtype)           # (63, tile)
    x = relu(_mmT(w1[...], p, b1[...])).astype(dtype)
    x = relu(_mmT(w2[...], x, b2[...])).astype(dtype)
    x = relu(_mmT(w3[...], x, b3[...])).astype(dtype)
    x = relu(_mmT(w4[...], x, b4[...])).astype(dtype)
    x = relu(_mmT(s2a[...], x) + _mmT(s2b[...], p) + sb1[...]).astype(dtype)
    x = relu(_mmT(s2w2[...], x, sb2[...])).astype(dtype)
    x = relu(_mmT(s2w3[...], x, sb3[...])).astype(dtype)

    sigma = _mmT(dw[...], x, db[...])

    h = _mmT(r1a[...], relu(x))
    h = h + _mmT(r1b[...], relu(dir_ref[...].astype(dtype)))
    if use_time:
        t_enc = _encode(ids, freqs, inc).astype(dtype)   # (21, tile)
        h = h + _mmT(r1c[...], relu(t_enc))
    h = relu(h + rb1[...]).astype(dtype)
    for i in range(n_rgb - 1):
        w_, b_ = rgb_rest[2 * i], rgb_rest[2 * i + 1]
        h = _mmT(w_[...], h, b_[...])
        if i < n_rgb - 2:
            h = relu(h).astype(dtype)

    out_ref[0:3, :] = h.astype(jnp.float32)
    out_ref[3:4, :] = sigma.astype(jnp.float32)


def _pad_cols(x, m):
    r = (-x.shape[-1]) % m
    if r:
        x = jnp.concatenate([x, jnp.zeros((*x.shape[:-1], r), x.dtype)], -1)
    return x


@functools.partial(jax.jit, static_argnames=("spec", "motion_mode",
                                              "compute_dtype", "interpret",
                                              "tile"))
def fused_field(space_kparams, motion_kparams, spec, xyz, ids, dir_enc,
                motion_mode: str | None = None,
                compute_dtype: str = "bfloat16",
                interpret: bool = False, tile: int = 2048,
                tile_flags=None):
    """Evaluate one deformed radiance field.

    xyz (3, M) raw canonical positions, ids (1, M) frame/camera ids,
    dir_enc (dir_dim, M) precomputed direction encoding.
    motion_mode: None | "lerp" (fractional-id blend) | "direct".
    ``tile_flags`` ((ceil(M/tile),) int32, optional): per-tile skip flags —
    a 0 tile writes zeros without touching the MXU. With the training batch
    sorted by bbox-hit pattern (engine/trainer.sort_batch_by_hit), tiles are
    hit-homogeneous and a performer field pays only for rays that can see
    it — the batch-level analogue of the renderer's chunk skip.
    -> (rgb (3, M), sigma (M,)).
    """
    m = xyz.shape[-1]
    xyz_p = _pad_cols(xyz, tile)
    ids_p = _pad_cols(ids, tile)
    dir_p = _pad_cols(dir_enc, tile)
    mp = xyz_p.shape[-1]
    n_rgb = 4 if spec.deep_rgb else 2
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    has_flags = tile_flags is not None
    cfg = (motion_mode, spec.use_time, n_rgb, spec.pos_freqs,
           spec.include_input, dtype, has_flags)

    kparams = (tuple(motion_kparams) if motion_mode else ()) + tuple(space_kparams)

    def tile_spec(rows):
        # index_map takes (i, *scalar_prefetch_refs) — works with and
        # without the flags prefetch operand
        return pl.BlockSpec((rows, tile), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [tile_spec(3), tile_spec(1), tile_spec(dir_p.shape[0])] + \
               [full] * len(kparams)

    W = spec.backbone_dim
    flops_per = 2 * (spec.pos_dim * W * 2 + 5 * W * W
                     + (W + spec.dir_dim + spec.time_dim) * 128
                     + (n_rgb - 1) * 128 * 128
                     + (85 * 128 + 4 * 128 * 128 + 128 * 3 if motion_mode else 0))
    out_spec = pl.BlockSpec((4, tile), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((4, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops_per * mp,
                                      bytes_accessed=mp * 4 * 40,
                                      transcendentals=mp * 70),
        interpret=interpret)
    if has_flags:
        flags = jnp.asarray(tile_flags, jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(mp // tile,),
            in_specs=in_specs, out_specs=out_spec)
        out = pl.pallas_call(functools.partial(_kernel, cfg),
                             grid_spec=grid_spec, **common)(
            flags, xyz_p, ids_p, dir_p, *kparams)
    else:
        out = pl.pallas_call(functools.partial(_kernel, cfg),
                             grid=(mp // tile,), in_specs=in_specs,
                             out_specs=out_spec, **common)(
            xyz_p, ids_p, dir_p, *kparams)
    return out[0:3, :m], out[3, :m]
