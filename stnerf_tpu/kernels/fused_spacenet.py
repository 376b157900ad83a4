"""Fused SpaceNet evaluation as a Pallas TPU kernel.

The radiance MLP is ~10 Linear layers; under plain XLA every layer's
(M, 256) activation round-trips HBM, which caps throughput well below the
MXU peak. This kernel keeps **all weights resident in VMEM** (~1 MB in
bfloat16) and streams sample tiles through the full trunk + heads in one
pass — inter-layer activations never leave the chip.

Design choices:
* Positional/direction/time encodings are computed *outside* (VPU-cheap,
  one HBM pass) — the kernel is pure matmul work, MXU-aligned.
* The reference's skip/head concatenations (ref: modeling/spacenet.py:137,
  143-149) are algebraically decomposed into split matmuls:
  ``concat([x, e]) @ W == x @ W[:d] + e @ W[d:]`` — no lane-dimension
  concatenation inside the kernel.
* The rgb head's leading ReLU applies to the *encoded dirs/time* too — a
  reference quirk (ref: modeling/spacenet.py:70-86) preserved by ReLU-ing
  each split operand before its matmul.
* Outputs are (TILE, 4) = [r, g, b, sigma] raw (sigmoid/relu live in the
  compositor, ref: layers/render_layer.py:8-17,47).

A stacked variant evaluates L performer fields with a (layer, tile) grid,
indexing each layer's weight block — the kernel-level counterpart of the
``vmap`` in models.layered._eval_fields.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


def _wt(p, dtype):
    return p["w"].astype(dtype)


def _bias(p):
    return p["b"].astype(jnp.float32)


def prepare_kernel_params(params: dict, spec, dtype=jnp.bfloat16):
    """Flatten a SpaceNet param pytree into the kernel operand list.

    ``spec`` is a models.spacenet.SpaceNetSpec. Returns a tuple of arrays;
    the stage2/rgb first-layer weights are split at the concat boundaries.
    Order must match ``_kernel``'s argument order. Pure slicing/casting —
    safe to trace inside jit (fuses into the surrounding program).
    """
    W = spec.backbone_dim
    s1 = params["stage1"]
    s2 = params["stage2"]
    rgb = params["rgb"]
    dens = params["density"][0]

    s2_first = s2[0]
    s2a = s2_first["w"][:W].astype(dtype)       # trunk part
    s2b = s2_first["w"][W:].astype(dtype)       # pos-enc skip part

    r_first = rgb[0]
    r1a = r_first["w"][:W].astype(dtype)        # trunk features
    rest = r_first["w"][W:]
    d_dim = spec.dir_dim
    r1b = rest[:d_dim].astype(dtype) if d_dim else jnp.zeros((1, r_first["w"].shape[1]), dtype)
    t_off = d_dim
    t_dim = spec.time_dim
    r1c = (rest[t_off:t_off + t_dim].astype(dtype) if t_dim
           else jnp.zeros((1, r_first["w"].shape[1]), dtype))

    ops = [
        _wt(s1[0], dtype), _bias(s1[0]), _wt(s1[1], dtype), _bias(s1[1]),
        _wt(s1[2], dtype), _bias(s1[2]), _wt(s1[3], dtype), _bias(s1[3]),
        s2a, s2b, _bias(s2_first), _wt(s2[1], dtype), _bias(s2[1]),
        _wt(s2[2], dtype), _bias(s2[2]),
        _wt(dens, dtype), _bias(dens),
        r1a, r1b, r1c, _bias(r_first),
    ]
    for layer in rgb[1:]:
        ops += [_wt(layer, dtype), _bias(layer)]
    return tuple(ops)


def _mm(x, w, b=None):
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y


def _kernel(n_rgb_layers, dtype,
            pos_ref, dir_ref, time_ref,
            w1, b1, w2, b2, w3, b3, w4, b4,
            s2a, s2b, sb1, s2w2, sb2, s2w3, sb3,
            dw, db, r1a, r1b, r1c, rb1, *rest_and_out):
    *rgb_rest, out_ref = rest_and_out
    relu = jax.nn.relu

    p = pos_ref[...].astype(dtype)
    x = relu(_mm(p, w1[...], b1[...])).astype(dtype)
    x = relu(_mm(x, w2[...], b2[...])).astype(dtype)
    x = relu(_mm(x, w3[...], b3[...])).astype(dtype)
    x = relu(_mm(x, w4[...], b4[...])).astype(dtype)
    # stage2 first layer: concat([x, pos_enc]) @ W -> split matmuls
    x = relu(_mm(x, s2a[...]) + _mm(p, s2b[...]) + sb1[...]).astype(dtype)
    x = relu(_mm(x, s2w2[...], sb2[...])).astype(dtype)
    x = relu(_mm(x, s2w3[...], sb3[...])).astype(dtype)

    sigma = _mm(x, dw[...], db[...])  # (TILE, 1)

    # rgb head: ReLU(concat([x, dir_enc, time_enc])) @ W -> split matmuls
    h = _mm(relu(x), r1a[...])
    h = h + _mm(relu(dir_ref[...].astype(dtype)), r1b[...])
    h = h + _mm(relu(time_ref[...].astype(dtype)), r1c[...])
    h = h + rb1[...]
    h = relu(h).astype(dtype)
    for i in range(n_rgb_layers - 1):
        w, b = rgb_rest[2 * i], rgb_rest[2 * i + 1]
        h = _mm(h, w[...], b[...])
        if i < n_rgb_layers - 2:
            h = relu(h).astype(dtype)

    out_ref[:, 0:3] = h.astype(jnp.float32)
    out_ref[:, 3:4] = sigma.astype(jnp.float32)


def _pad_rows(x, m):
    r = (-x.shape[0]) % m
    if r:
        x = jnp.concatenate([x, jnp.zeros((r, *x.shape[1:]), x.dtype)], 0)
    return x


@functools.partial(jax.jit, static_argnames=("spec", "compute_dtype", "interpret", "tile"))
def fused_spacenet(kparams, spec, pos_enc, dir_enc, time_enc=None,
                   compute_dtype: str = "bfloat16", interpret: bool = False,
                   tile: int = TILE):
    """Evaluate one SpaceNet. pos_enc (M, pos_dim), dir_enc (M, dir_dim),
    time_enc (M, time_dim) or None -> (rgb (M, 3), sigma (M,))."""
    m = pos_enc.shape[0]
    if time_enc is None:
        time_enc = jnp.zeros((m, 1), pos_enc.dtype)
    pos_p = _pad_rows(pos_enc, tile)
    dir_p = _pad_rows(dir_enc, tile)
    time_p = _pad_rows(time_enc, tile)
    mp = pos_p.shape[0]
    n_rgb = 4 if spec.deep_rgb else 2
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def tile_spec(width):
        return pl.BlockSpec((tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [tile_spec(pos_p.shape[1]), tile_spec(dir_p.shape[1]),
                tile_spec(time_p.shape[1])] + [full] * len(kparams)

    flops_per = 2 * (spec.pos_dim * 256 + 3 * 256 * 256 + (256 + spec.pos_dim) * 256
                     + 2 * 256 * 256 + 256 + 300 * 128 + (n_rgb - 1) * 128 * 128)
    out = pl.pallas_call(
        functools.partial(_kernel, n_rgb, dtype),
        grid=(mp // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops_per * mp,
                                      bytes_accessed=mp * 4 * (64 + 32 + 24 + 4),
                                      transcendentals=0),
        interpret=interpret,
    )(pos_p, dir_p, time_p, *kparams)
    return out[:m, 0:3], out[:m, 3]


# ---------------------------------------------------------------------------
# Feature-major (planar) variant — the production path.
#
# Operands are (features, M): the big sample axis M lives on the TPU lane
# dimension, so nothing is tile-padded (a (M, 3)/(M, 4) row-major tensor pads
# 32-43x in HBM). Matmuls contract the leading feature axis: y = w^T x.
# ---------------------------------------------------------------------------

def _mmT(w, x, b=None):
    """w: (in, out), x: (in, tile) -> (out, tile) [+ b (out, 1)]."""
    y = jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y


def _kernel_planar(n_rgb_layers, dtype,
                   pos_ref, dir_ref, time_ref,
                   w1, b1, w2, b2, w3, b3, w4, b4,
                   s2a, s2b, sb1, s2w2, sb2, s2w3, sb3,
                   dw, db, r1a, r1b, r1c, rb1, *rest_and_out):
    *rgb_rest, out_ref = rest_and_out
    relu = jax.nn.relu

    p = pos_ref[...].astype(dtype)                       # (pos_dim, tile)
    x = relu(_mmT(w1[...], p, b1[...])).astype(dtype)
    x = relu(_mmT(w2[...], x, b2[...])).astype(dtype)
    x = relu(_mmT(w3[...], x, b3[...])).astype(dtype)
    x = relu(_mmT(w4[...], x, b4[...])).astype(dtype)
    x = relu(_mmT(s2a[...], x) + _mmT(s2b[...], p) + sb1[...]).astype(dtype)
    x = relu(_mmT(s2w2[...], x, sb2[...])).astype(dtype)
    x = relu(_mmT(s2w3[...], x, sb3[...])).astype(dtype)

    sigma = _mmT(dw[...], x, db[...])                    # (1, tile)

    h = _mmT(r1a[...], relu(x))
    h = h + _mmT(r1b[...], relu(dir_ref[...].astype(dtype)))
    h = h + _mmT(r1c[...], relu(time_ref[...].astype(dtype)))
    h = relu(h + rb1[...]).astype(dtype)
    for i in range(n_rgb_layers - 1):
        w, b = rgb_rest[2 * i], rgb_rest[2 * i + 1]
        h = _mmT(w[...], h, b[...])
        if i < n_rgb_layers - 2:
            h = relu(h).astype(dtype)

    out_ref[0:3, :] = h.astype(jnp.float32)
    out_ref[3:4, :] = sigma.astype(jnp.float32)


def prepare_kernel_params_planar(params: dict, spec, dtype=jnp.bfloat16):
    """Same operand list as :func:`prepare_kernel_params` but biases shaped
    (out, 1) for column broadcast in the feature-major kernel."""
    ops = prepare_kernel_params(params, spec, dtype)
    return tuple(op[:, None] if op.ndim == 1 else op for op in ops)


def _pad_cols(x, m):
    r = (-x.shape[-1]) % m
    if r:
        x = jnp.concatenate([x, jnp.zeros((*x.shape[:-1], r), x.dtype)], -1)
    return x


@functools.partial(jax.jit, static_argnames=("spec", "compute_dtype",
                                              "interpret", "tile"))
def fused_spacenet_planar(kparams, spec, pos_enc, dir_enc, time_enc=None,
                          compute_dtype: str = "bfloat16",
                          interpret: bool = False, tile: int = 2048):
    """Feature-major fused evaluation.

    pos_enc (pos_dim, M), dir_enc (dir_dim, M), time_enc (time_dim, M)|None
    -> (rgb (3, M), sigma (M,)). ``kparams`` from
    :func:`prepare_kernel_params_planar`.
    """
    m = pos_enc.shape[-1]
    if time_enc is None:
        time_enc = jnp.zeros((1, m), pos_enc.dtype)
    pos_p = _pad_cols(pos_enc, tile)
    dir_p = _pad_cols(dir_enc, tile)
    time_p = _pad_cols(time_enc, tile)
    mp = pos_p.shape[-1]
    n_rgb = 4 if spec.deep_rgb else 2
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def tile_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [tile_spec(pos_p.shape[0]), tile_spec(dir_p.shape[0]),
                tile_spec(time_p.shape[0])] + [full] * len(kparams)

    W = spec.backbone_dim
    flops_per = 2 * (spec.pos_dim * W * 2 + 5 * W * W + W
                     + (W + spec.dir_dim + spec.time_dim) * 128
                     + (n_rgb - 1) * 128 * 128)
    out = pl.pallas_call(
        functools.partial(_kernel_planar, n_rgb, dtype),
        grid=(mp // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * mp,
            bytes_accessed=mp * 4 * (spec.pos_dim + spec.dir_dim + 8),
            transcendentals=0),
        interpret=interpret,
    )(pos_p, dir_p, time_p, *kparams)
    return out[0:3, :m], out[3, :m]


def fused_spacenet_stacked(kparams_stacked, spec, pos_enc, dir_enc,
                           time_enc=None, compute_dtype: str = "bfloat16",
                           interpret: bool = False):
    """Stacked-layer variant: every operand of ``kparams_stacked`` carries a
    leading layer axis; pos_enc (L, M, pos_dim). Evaluated through vmap —
    Mosaic turns the batched grid into a (layer, tile) loop with the right
    weight block per layer."""
    f = functools.partial(fused_spacenet, spec=spec,
                          compute_dtype=compute_dtype, interpret=interpret)
    if time_enc is None:
        return jax.vmap(lambda kp, p, d: f(kp, pos_enc=p, dir_enc=d)
                        )(kparams_stacked, pos_enc, dir_enc)
    return jax.vmap(lambda kp, p, d, t: f(kp, pos_enc=p, dir_enc=d, time_enc=t)
                    )(kparams_stacked, pos_enc, dir_enc, time_enc)
