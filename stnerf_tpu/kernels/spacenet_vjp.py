"""Trainable fused SpaceNet: forward Pallas kernel + manual backward kernel.

The backward kernel recomputes the forward activations per sample tile in
VMEM (flash-attention style — nothing is saved to HBM between passes) and
backpropagates through the whole trunk/head chain, accumulating weight and
bias gradients across grid steps into revisited output blocks (the standard
Mosaic accumulator pattern). The position-encoding gradient carries the
MotionNet training signal through the displaced sample positions, and the
direction-encoding gradient carries the POSE_REFINEMENT signal back to the
ray directions; the time encoding receives zeros (frame ids are integral
inputs, never differentiated).

Exposed as :func:`spacenet_planar_trainable` — a ``jax.custom_vjp`` drop-in
for models.spacenet.apply_spacenet_planar on pre-encoded planar inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_spacenet import _mmT, _pad_cols, prepare_kernel_params_planar

# operand order produced by prepare_kernel_params_planar
_N_BASE_OPS = 21  # stage1 (4w+4b), s2a, s2b, sb1, s2 (2w+2b), dens (w+b), rgb first (3w+1b)


def _fwd_chain(dtype, p, d_enc, t_enc, ops, n_rgb):
    """Forward pass keeping every post-ReLU activation. Returns
    (activations list, sigma (1,t), rgb (3,t), head activations)."""
    (w1, b1, w2, b2, w3, b3, w4, b4,
     s2a, s2b, sb1, s2w2, sb2, s2w3, sb3,
     dw, db, r1a, r1b, r1c, rb1, *rgb_rest) = ops
    relu = jax.nn.relu
    a = [None] * 7
    a[0] = relu(_mmT(w1, p, b1)).astype(dtype)
    a[1] = relu(_mmT(w2, a[0], b2)).astype(dtype)
    a[2] = relu(_mmT(w3, a[1], b3)).astype(dtype)
    a[3] = relu(_mmT(w4, a[2], b4)).astype(dtype)
    a[4] = relu(_mmT(s2a, a[3]) + _mmT(s2b, p) + sb1).astype(dtype)
    a[5] = relu(_mmT(s2w2, a[4], sb2)).astype(dtype)
    a[6] = relu(_mmT(s2w3, a[5], sb3)).astype(dtype)

    sigma = _mmT(dw, a[6], db)

    h0 = (_mmT(r1a, relu(a[6])) + _mmT(r1b, relu(d_enc)) +
          (_mmT(r1c, relu(t_enc)) if t_enc is not None else 0.0) + rb1)
    hs = [relu(h0).astype(dtype)]
    for i in range(n_rgb - 1):
        w_, b_ = rgb_rest[2 * i], rgb_rest[2 * i + 1]
        y = _mmT(w_, hs[-1], b_)
        hs.append(relu(y).astype(dtype) if i < n_rgb - 2 else y)
    return a, sigma, hs


def _mm_grad_w(x, dy):
    """dW for y = W^T x: x (in, t), dy (out, t) -> (in, out).

    Uses an explicit transpose + plain (1,0) contraction: Mosaic's
    transpose-rhs matmul path rejects bf16 operands."""
    return jax.lax.dot_general(x, dy.astype(x.dtype).T,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_dx(w, dy):
    """dx for y = W^T x: w (in, out), dy (out, t) -> (in, t), f32 acc."""
    return jax.lax.dot_general(w, dy.astype(w.dtype), (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)



def _where_pos(x, dy):
    """dy masked to where x > 0. The compare runs in f32: Mosaic rejects
    cmpf on packed bf16 vectors."""
    return jnp.where(x.astype(jnp.float32) > 0.0, dy, 0.0)

def _bwd_math(cfg, p, d_enc, t_enc, ops, dy_rgb, d_sig):
    """SpaceNet backward on one sample tile: recompute forward activations,
    backprop heads + trunk. Returns (weight grads list, d_pos_enc (f32),
    d_dir_enc (f32)). Shared by the pre-encoded kernel below and the fully
    fused field kernel (field_vjp)."""
    (use_time, n_rgb, dtype) = cfg
    n_ops = _N_BASE_OPS + 2 * (n_rgb - 1)
    relu = jax.nn.relu
    a, _, hs = _fwd_chain(dtype, p, d_enc, t_enc, ops, n_rgb)

    (w1, b1, w2, b2, w3, b3, w4, b4,
     s2a, s2b, sb1, s2w2, sb2, s2w3, sb3,
     dw, db, r1a, r1b, r1c, rb1, *rgb_rest) = ops

    grads = [None] * n_ops

    # ---- rgb head backward ----
    dy = dy_rgb.astype(dtype)                     # (3, t) cotangent
    for i in reversed(range(n_rgb - 1)):
        w_ = rgb_rest[2 * i]
        x_in = hs[i]
        gi = _N_BASE_OPS + 2 * i
        grads[gi] = _mm_grad_w(x_in, dy)                 # dW
        grads[gi + 1] = jnp.sum(dy, axis=1, keepdims=True)  # db
        dy = _mm_dx(w_, dy).astype(dtype)                 # dx = W dy
        dy = _where_pos(hs[i], dy).astype(dtype)  # through ReLU(h_i)
    # dy now is d(h0 pre-relu) already masked by hs[0]>0
    grads[20] = jnp.sum(dy, axis=1, keepdims=True)        # rb1
    rx = relu(a[6])
    grads[17] = _mm_grad_w(rx, dy)                        # r1a
    grads[18] = _mm_grad_w(relu(d_enc), dy)               # r1b
    # gradient wrt the direction encoding (through the head's leading ReLU):
    # carries the POSE_REFINEMENT training signal back to the ray directions
    d_denc = _where_pos(d_enc, _mm_dx(r1b, dy)).astype(jnp.float32)
    grads[19] = (_mm_grad_w(relu(t_enc), dy) if use_time
                 else jnp.zeros_like(r1c, dtype=jnp.float32))
    d_a6 = _mm_dx(r1a, dy).astype(dtype)
    d_a6 = _where_pos(a[6], d_a6)  # ReLU(a6) in head input; a6>=0 so
    # relu is identity there, but the mask also kills exact zeros (dead units)

    # ---- density head backward ----
    ds = d_sig.astype(dtype)                      # (1, t)
    grads[15] = _mm_grad_w(a[6], ds)              # dw
    grads[16] = jnp.sum(ds, axis=1, keepdims=True)
    d_a6 = (d_a6 + _mm_dx(dw, ds)).astype(dtype)

    # ---- trunk backward ----
    # stage2 layer 3: a6 = relu(s2w3^T a5 + b)
    dy = _where_pos(a[6], d_a6).astype(dtype)
    grads[13] = _mm_grad_w(a[5], dy)
    grads[14] = jnp.sum(dy, axis=1, keepdims=True)
    d_a5 = _mm_dx(s2w3, dy).astype(dtype)
    # stage2 layer 2
    dy = _where_pos(a[5], d_a5).astype(dtype)
    grads[11] = _mm_grad_w(a[4], dy)
    grads[12] = jnp.sum(dy, axis=1, keepdims=True)
    d_a4 = _mm_dx(s2w2, dy).astype(dtype)
    # stage2 layer 1 (split input: [a3, p])
    dy = _where_pos(a[4], d_a4).astype(dtype)
    grads[8] = _mm_grad_w(a[3], dy)     # s2a
    grads[9] = _mm_grad_w(p, dy)        # s2b
    grads[10] = jnp.sum(dy, axis=1, keepdims=True)
    d_a3 = _mm_dx(s2a, dy).astype(dtype)
    dy4 = dy                            # skip-path cotangent for d_pos
    # stage1
    for idx, (w_, x_in, x_out) in enumerate(
            [(w4, a[2], a[3]), (w3, a[1], a[2]), (w2, a[0], a[1])]):
        dy = _where_pos(x_out, d_a3).astype(dtype)
        g = 6 - 2 * idx
        grads[g] = _mm_grad_w(x_in, dy)
        grads[g + 1] = jnp.sum(dy, axis=1, keepdims=True)
        d_a3 = _mm_dx(w_, dy).astype(dtype)
    dy = _where_pos(a[0], d_a3).astype(dtype)
    grads[0] = _mm_grad_w(p, dy)
    grads[1] = jnp.sum(dy, axis=1, keepdims=True)

    # gradient wrt the position encoding: stage1 first layer + stage2 skip
    d_p = (_mm_dx(w1, dy) + _mm_dx(s2b, dy4)).astype(jnp.float32)
    return grads, d_p, d_denc


def accumulate_grads(grefs, grads):
    """Write weight grads into revisited output blocks: initialize on the
    first grid step, accumulate after (the standard Mosaic pattern)."""
    first = pl.program_id(0) == 0
    for gref, g in zip(grefs, grads):
        gv = g.astype(jnp.float32)
        if gv.ndim == 2 and gref.shape != gv.shape:
            gv = gv.reshape(gref.shape)

        @pl.when(first)
        def _(gref=gref, gv=gv):
            gref[...] = gv

        @pl.when(jnp.logical_not(first))
        def _(gref=gref, gv=gv):
            gref[...] = gref[...] + gv


def _bwd_kernel(cfg, pos_ref, dir_ref, time_ref, drgb_ref, dsig_ref,
                *op_and_grad_refs):
    (use_time, n_rgb, dtype) = cfg
    n_ops = _N_BASE_OPS + 2 * (n_rgb - 1)
    ops = [r[...] for r in op_and_grad_refs[:n_ops]]
    *grefs, dpos_ref, ddir_ref = op_and_grad_refs[n_ops:]

    p = pos_ref[...].astype(dtype)
    d_enc = dir_ref[...].astype(dtype)
    t_enc = time_ref[...].astype(dtype) if use_time else None
    grads, d_p, d_denc = _bwd_math(cfg, p, d_enc, t_enc, ops,
                                   drgb_ref[...], dsig_ref[...])
    dpos_ref[...] = d_p
    ddir_ref[...] = d_denc
    accumulate_grads(grefs, grads)


def _fwd_kernel(cfg, pos_ref, dir_ref, time_ref, *op_refs_and_out):
    (use_time, n_rgb, dtype) = cfg
    *op_refs, out_ref = op_refs_and_out
    ops = [r[...] for r in op_refs]
    p = pos_ref[...].astype(dtype)
    d_enc = dir_ref[...].astype(dtype)
    t_enc = time_ref[...].astype(dtype) if use_time else None
    _, sigma, hs = _fwd_chain(dtype, p, d_enc, t_enc, ops, n_rgb)
    out_ref[0:3, :] = hs[-1].astype(jnp.float32)
    out_ref[3:4, :] = sigma.astype(jnp.float32)


def _call_fwd(kparams, spec, pos_enc, dir_enc, time_enc, compute_dtype,
              interpret, tile):
    m = pos_enc.shape[-1]
    t_e = time_enc if time_enc is not None else jnp.zeros((1, m), pos_enc.dtype)
    pos_p, dir_p, time_p = (_pad_cols(x, tile) for x in (pos_enc, dir_enc, t_e))
    mp = pos_p.shape[-1]
    n_rgb = 4 if spec.deep_rgb else 2
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    cfg = (spec.use_time, n_rgb, dtype)

    def tile_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(mp // tile,),
        in_specs=[tile_spec(pos_p.shape[0]), tile_spec(dir_p.shape[0]),
                  tile_spec(time_p.shape[0])] + [full] * len(kparams),
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, mp), jnp.float32),
        interpret=interpret,
    )(pos_p, dir_p, time_p, *kparams)
    return out[0:3, :m], out[3, :m]


def _call_bwd(kparams, spec, pos_enc, dir_enc, time_enc, d_rgb, d_sigma,
              compute_dtype, interpret, tile):
    m = pos_enc.shape[-1]
    t_e = time_enc if time_enc is not None else jnp.zeros((1, m), pos_enc.dtype)
    pos_p, dir_p, time_p = (_pad_cols(x, tile) for x in (pos_enc, dir_enc, t_e))
    drgb_p = _pad_cols(d_rgb, tile)            # padding is zeros: no grad leak
    dsig_p = _pad_cols(d_sigma[None], tile)
    mp = pos_p.shape[-1]
    n_rgb = 4 if spec.deep_rgb else 2
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    cfg = (spec.use_time, n_rgb, dtype)

    def tile_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # weight-grad outputs: same shapes as operands, one block revisited by
    # every grid step
    out_shapes = [jax.ShapeDtypeStruct(op.shape, jnp.float32) for op in kparams]
    out_specs = [pl.BlockSpec(op.shape,
                              (lambda nd: (lambda i: (0,) * nd))(len(op.shape)),
                              memory_space=pltpu.VMEM) for op in kparams]
    out_shapes.append(jax.ShapeDtypeStruct((pos_p.shape[0], mp), jnp.float32))
    out_specs.append(tile_spec(pos_p.shape[0]))
    out_shapes.append(jax.ShapeDtypeStruct((dir_p.shape[0], mp), jnp.float32))
    out_specs.append(tile_spec(dir_p.shape[0]))
    *grads, dpos, ddir = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(mp // tile,),
        in_specs=[tile_spec(pos_p.shape[0]), tile_spec(dir_p.shape[0]),
                  tile_spec(time_p.shape[0]), tile_spec(3), tile_spec(1)]
                 + [full] * len(kparams),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(pos_p, dir_p, time_p, drgb_p, dsig_p, *kparams)
    return grads, dpos[:, :m], ddir[:, :m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7))
def spacenet_planar_trainable(params, spec, pos_enc, dir_enc, time_enc,
                              compute_dtype="bfloat16", interpret=False,
                              tile=1024):
    """Differentiable fused SpaceNet on pre-encoded planar inputs.

    params: the SpaceNet pytree (models.spacenet.init_spacenet); gradients
    are returned for params, the position encoding and the direction
    encoding (the time encoding receives zeros — frame ids are integral).
    """
    kp = prepare_kernel_params_planar(params, spec,
                                      jnp.bfloat16 if compute_dtype == "bfloat16"
                                      else jnp.float32)
    return _call_fwd(kp, spec, pos_enc, dir_enc, time_enc, compute_dtype,
                     interpret, tile)


def _vjp_fwd(params, spec, pos_enc, dir_enc, time_enc, compute_dtype,
             interpret, tile):
    out = spacenet_planar_trainable(params, spec, pos_enc, dir_enc, time_enc,
                                    compute_dtype, interpret, tile)
    return out, (params, pos_enc, dir_enc, time_enc)


def _unflatten_grads(flat, params, spec):
    """Map the flat operand-order gradients back onto the param pytree,
    re-fusing the split stage2/rgb first-layer weights."""
    W = spec.backbone_dim
    n_rgb = 4 if spec.deep_rgb else 2
    g = [jnp.asarray(x) for x in flat]

    def lin(w, b):
        return {"w": w, "b": b.reshape(-1)}

    out = {
        "stage1": [lin(g[0], g[1]), lin(g[2], g[3]), lin(g[4], g[5]),
                   lin(g[6], g[7])],
        "stage2": [lin(jnp.concatenate([g[8], g[9]], axis=0), g[10]),
                   lin(g[11], g[12]), lin(g[13], g[14])],
        "density": [lin(g[15], g[16])],
    }
    d_dim, t_dim = spec.dir_dim, spec.time_dim
    r1_parts = [g[17]]
    if d_dim:
        r1_parts.append(g[18][:d_dim])
    if t_dim:
        r1_parts.append(g[19][:t_dim])
    rgb = [lin(jnp.concatenate(r1_parts, axis=0), g[20])]
    for i in range(n_rgb - 1):
        rgb.append(lin(g[_N_BASE_OPS + 2 * i], g[_N_BASE_OPS + 2 * i + 1]))
    out["rgb"] = rgb
    return out


def _vjp_bwd(spec, compute_dtype, interpret, tile, residuals, cotangents):
    params, pos_enc, dir_enc, time_enc = residuals
    d_rgb, d_sigma = cotangents
    kp = prepare_kernel_params_planar(params, spec,
                                      jnp.bfloat16 if compute_dtype == "bfloat16"
                                      else jnp.float32)
    flat, d_pos, d_dir = _call_bwd(kp, spec, pos_enc, dir_enc, time_enc, d_rgb,
                                   d_sigma, compute_dtype, interpret, tile)
    d_params = _unflatten_grads(flat, params, spec)
    d_time = None if time_enc is None else jnp.zeros_like(time_enc)
    return (d_params, d_pos.astype(pos_enc.dtype),
            d_dir.astype(dir_enc.dtype), d_time)


spacenet_planar_trainable.defvjp(_vjp_fwd, _vjp_bwd)
