"""Fully-fused trainable field: MotionNet + encodings + SpaceNet, forward
AND manual backward as Pallas kernels.

The forward pass is kernels.fused_field (deform + encode + radiance MLP in
one VMEM-resident pass). This module adds the hand-differentiated backward:
per sample tile it recomputes the motion encoding, the flow MLP, the
displaced-position encoding and every SpaceNet activation in VMEM
(flash-attention style), then backpropagates

    rgb/sigma cotangents -> SpaceNet weights (spacenet_vjp._bwd_math)
                         -> d(position encoding) -> d(displaced xyz) via the
                            trig-encoding VJP (the sin/cos values are already
                            in the forward encoding — 3 fused multiplies per
                            octave, no new transcendentals)
                         -> MotionNet weights + d(motion encoding) -> d(xyz)
                         -> d(direction encoding)   [POSE_REFINEMENT signal]

so the whole training step's field work — forward and backward — runs in two
kernel launches per field with zero intermediate HBM tensors (the staged
trainable path materializes the 63xM position encoding, the 85xM motion
encoding and the flow in HBM both ways). Weight gradients accumulate across
grid steps into revisited f32 output blocks.

Replaces the reference's per-layer ``MotionNet`` + ``SpaceNet`` torch stack
on the training path (ref: modeling/layered_rfrender.py:340-368, 481-576;
modeling/motion_net.py:35-70; modeling/spacenet.py:101-160).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_field import _encode, fused_field, prepare_motion_params_planar
from .fused_spacenet import _mmT, _pad_cols, prepare_kernel_params_planar
from .spacenet_vjp import (_N_BASE_OPS, _bwd_math, _mm_dx, _mm_grad_w,
                           _unflatten_grads, _where_pos, accumulate_grads)

N_MOTION_OPS = 12  # 6 x (w, b) from prepare_motion_params_planar


def _encode_vjp(enc, d_enc, c, freqs, inc):
    """VJP of :func:`fused_field._encode` wrt its raw (c, t) input.

    ``enc`` is the forward encoding (f32): its sin/cos rows ARE the
    derivative factors (d sin(2^k x) = 2^k cos(2^k x) dx and vice versa),
    so the pullback is pure VPU multiply-adds."""
    off = c if inc else 0
    d_v = d_enc[:c] if inc else jnp.zeros((c, enc.shape[-1]), jnp.float32)
    scale = 1.0
    for k in range(freqs):
        s = enc[off + 2 * k * c: off + (2 * k + 1) * c]
        co = enc[off + (2 * k + 1) * c: off + (2 * k + 2) * c]
        ds = d_enc[off + 2 * k * c: off + (2 * k + 1) * c]
        dc = d_enc[off + (2 * k + 1) * c: off + (2 * k + 2) * c]
        d_v = d_v + scale * (co * ds - s * dc)
        scale = scale * 2.0
    return d_v


def _motion_fwd(dtype, m_ops, enc):
    """Flow MLP forward keeping per-layer inputs. enc (in, t) f32 ->
    (inputs list [x_0..x_5], flow (3, t) f32)."""
    relu = jax.nn.relu
    h = enc.astype(dtype)
    acts = []
    for k in range(6):
        acts.append(h)
        h = _mmT(m_ops[2 * k], h, m_ops[2 * k + 1])
        if k < 5:
            h = relu(h).astype(dtype)
    return acts, h


def _motion_bwd(dtype, m_ops, acts, d_flow):
    """Backprop the flow MLP. Returns (12 weight/bias grads, d_enc (f32))."""
    grads = [None] * N_MOTION_OPS
    dy = d_flow.astype(dtype)
    for k in reversed(range(6)):
        grads[2 * k] = _mm_grad_w(acts[k], dy)
        grads[2 * k + 1] = jnp.sum(dy, axis=1, keepdims=True)
        dx = _mm_dx(m_ops[2 * k], dy)
        if k > 0:
            dx = _where_pos(acts[k], dx).astype(dtype)
        dy = dx
    return grads, dy.astype(jnp.float32)


def _accumulate_add(grefs, grads):
    """Add-only accumulation (init handled separately — used under a
    skip-flag ``pl.when`` where the first grid step may not execute the
    compute branch)."""
    for gref, g in zip(grefs, grads):
        gv = g.astype(jnp.float32)
        if gv.ndim == 2 and gref.shape != gv.shape:
            gv = gv.reshape(gref.shape)
        gref[...] = gref[...] + gv


def _field_bwd_kernel(cfg, *all_refs):
    (motion_mode, use_time, n_rgb, freqs, inc, dtype, has_flags) = cfg
    if not has_flags:
        _field_bwd_body(cfg, accumulate_grads, *all_refs)
        return

    flags_ref, *refs_all = all_refs
    n_motion = N_MOTION_OPS if motion_mode else 0
    n_sops = _N_BASE_OPS + 2 * (n_rgb - 1)
    tail = refs_all[5 + n_motion + n_sops:]
    *grefs, dxyz_ref, ddir_ref = tail

    @pl.when(pl.program_id(0) == 0)
    def _():
        # accumulators must be defined even if every tile is skipped
        for gref in grefs:
            gref[...] = jnp.zeros_like(gref[...])

    @pl.when(flags_ref[pl.program_id(0)] != 0)
    def _():
        _field_bwd_body(cfg, _accumulate_add, *refs_all)

    @pl.when(flags_ref[pl.program_id(0)] == 0)
    def _():
        dxyz_ref[...] = jnp.zeros_like(dxyz_ref[...])
        ddir_ref[...] = jnp.zeros_like(ddir_ref[...])


def _field_bwd_body(cfg, accumulate, xyz_ref, id_ref, dir_ref, drgb_ref,
                    dsig_ref, *refs):
    (motion_mode, use_time, n_rgb, freqs, inc, dtype, _) = cfg
    n_motion = N_MOTION_OPS if motion_mode else 0
    n_sops = _N_BASE_OPS + 2 * (n_rgb - 1)
    m_ops = [r[...] for r in refs[:n_motion]]
    s_ops = [r[...] for r in refs[n_motion:n_motion + n_sops]]
    *grefs, dxyz_ref, ddir_ref = refs[n_motion + n_sops:]

    xyz = xyz_ref[...]                                   # (3, t) f32
    ids = id_ref[...]                                    # (1, t) f32
    d_enc_dir = dir_ref[...].astype(dtype)

    # ---- recompute the deformation (as in fused_field._kernel) ----
    e_lo = e_hi = w = enc_m = m_acts = None
    if motion_mode:
        if motion_mode == "lerp":
            lo = jnp.floor(ids)
            w = ids - lo
            e_lo = _encode(jnp.concatenate([xyz, lo], axis=0), freqs, inc)
            e_hi = _encode(jnp.concatenate([xyz, lo + 1.0], axis=0), freqs, inc)
            enc_m = (1.0 - w) * e_lo + w * e_hi
        else:  # direct
            enc_m = _encode(jnp.concatenate([xyz, ids], axis=0), freqs, inc)
        m_acts, flow = _motion_fwd(dtype, m_ops, enc_m)
        x_d = xyz + flow
    else:
        x_d = xyz

    p32 = _encode(x_d, freqs, inc)                       # (pos_dim, t) f32
    t_enc = _encode(ids, freqs, inc).astype(dtype) if use_time else None

    # ---- SpaceNet backward (recomputes its own activations from p) ----
    s_grads, d_p, d_denc = _bwd_math((use_time, n_rgb, dtype),
                                     p32.astype(dtype), d_enc_dir, t_enc,
                                     s_ops, drgb_ref[...], dsig_ref[...])
    ddir_ref[...] = d_denc

    # d(displaced xyz) through the position encoding
    d_xd = _encode_vjp(p32, d_p, 3, freqs, inc)

    if motion_mode:
        m_grads, d_enc_m = _motion_bwd(dtype, m_ops, m_acts, d_xd)
        if motion_mode == "lerp":
            # enc = (1-w) e_lo + w e_hi; w is stop-gradient (integral ids in
            # training; retiming schedules are data, not parameters)
            d_lo = _encode_vjp(e_lo, (1.0 - w) * d_enc_m, 4, freqs, inc)
            d_hi = _encode_vjp(e_hi, w * d_enc_m, 4, freqs, inc)
            d_xyz_m = d_lo[:3] + d_hi[:3]
        else:
            d_xyz_m = _encode_vjp(enc_m, d_enc_m, 4, freqs, inc)[:3]
        # x_d = xyz + flow(xyz): both paths feed d_xyz
        dxyz_ref[...] = d_xd + d_xyz_m
        accumulate(grefs, m_grads + s_grads)
    else:
        dxyz_ref[...] = d_xd
        accumulate(grefs, s_grads)


def _call_bwd(space_kp, motion_kp, spec, motion_mode, xyz, ids, dir_enc,
              d_rgb, d_sigma, compute_dtype, interpret, tile,
              tile_flags=None):
    m = xyz.shape[-1]
    xyz_p, ids_p, dir_p = (_pad_cols(x, tile) for x in (xyz, ids, dir_enc))
    drgb_p = _pad_cols(d_rgb, tile)              # zero padding: no grad leak
    dsig_p = _pad_cols(d_sigma[None], tile)
    mp = xyz_p.shape[-1]
    n_rgb = 4 if spec.deep_rgb else 2
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    has_flags = tile_flags is not None
    cfg = (motion_mode, spec.use_time, n_rgb, spec.pos_freqs,
           spec.include_input, dtype, has_flags)

    kparams = (tuple(motion_kp) if motion_mode else ()) + tuple(space_kp)

    def tile_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # weight-grad outputs: one full block revisited by every grid step
    out_shapes = [jax.ShapeDtypeStruct(op.shape, jnp.float32)
                  for op in kparams]
    out_specs = [pl.BlockSpec(op.shape,
                              (lambda nd: (lambda i, *_: (0,) * nd))(len(op.shape)),
                              memory_space=pltpu.VMEM) for op in kparams]
    out_shapes += [jax.ShapeDtypeStruct((3, mp), jnp.float32),
                   jax.ShapeDtypeStruct((dir_p.shape[0], mp), jnp.float32)]
    out_specs += [tile_spec(3), tile_spec(dir_p.shape[0])]

    in_specs = [tile_spec(3), tile_spec(1), tile_spec(dir_p.shape[0]),
                tile_spec(3), tile_spec(1)] + [full] * len(kparams)
    args = (xyz_p, ids_p, dir_p, drgb_p, dsig_p, *kparams)
    if has_flags:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(mp // tile,),
            in_specs=in_specs, out_specs=tuple(out_specs))
        outs = pl.pallas_call(
            functools.partial(_field_bwd_kernel, cfg),
            grid_spec=grid_spec, out_shape=tuple(out_shapes),
            interpret=interpret,
        )(jnp.asarray(tile_flags, jnp.int32), *args)
    else:
        outs = pl.pallas_call(
            functools.partial(_field_bwd_kernel, cfg),
            grid=(mp // tile,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*args)
    *grads, dxyz, ddir = outs
    n_motion = N_MOTION_OPS if motion_mode else 0
    return (grads[:n_motion], grads[n_motion:],
            dxyz[:, :m], ddir[:, :m])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def field_planar_trainable(space_params, motion_params, xyz, ids, dir_enc,
                           tile_flags, spec, motion_mode=None,
                           compute_dtype="bfloat16", interpret=False,
                           tile=1024):
    """Differentiable fully-fused field on raw planar positions.

    space_params: SpaceNet pytree; motion_params: MotionNet pytree or None;
    xyz (3, M) canonical pre-deformation positions; ids (1, M) frame ids
    (never differentiated); dir_enc (dir_dim, M) direction encoding;
    tile_flags ((ceil(M/tile),) int32 or None) per-tile skip flags — 0
    tiles write zero outputs forward and contribute zero gradients (exact,
    because downstream hit-masking already zeroes those rays' densities).
    -> (rgb (3, M), sigma (M,)). Gradients flow to both param trees, xyz
    (through deformation + position encoding) and dir_enc.
    """
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    skp = prepare_kernel_params_planar(space_params, spec, dtype)
    mkp = (prepare_motion_params_planar(motion_params, dtype)
           if motion_mode else ())
    return fused_field(skp, mkp, spec, xyz, ids, dir_enc,
                       motion_mode=motion_mode, compute_dtype=compute_dtype,
                       interpret=interpret, tile=tile, tile_flags=tile_flags)


def _vjp_fwd(space_params, motion_params, xyz, ids, dir_enc, tile_flags,
             spec, motion_mode, compute_dtype, interpret, tile):
    out = field_planar_trainable(space_params, motion_params, xyz, ids,
                                 dir_enc, tile_flags, spec, motion_mode,
                                 compute_dtype, interpret, tile)
    return out, (space_params, motion_params, xyz, ids, dir_enc, tile_flags)


def _unflatten_motion_grads(flat):
    return {"net": [{"w": flat[2 * k], "b": flat[2 * k + 1].reshape(-1)}
                    for k in range(6)]}


def _vjp_bwd(spec, motion_mode, compute_dtype, interpret, tile, residuals,
             cotangents):
    space_params, motion_params, xyz, ids, dir_enc, tile_flags = residuals
    d_rgb, d_sigma = cotangents
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    skp = prepare_kernel_params_planar(space_params, spec, dtype)
    mkp = (prepare_motion_params_planar(motion_params, dtype)
           if motion_mode else ())
    m_flat, s_flat, d_xyz, d_dir = _call_bwd(
        skp, mkp, spec, motion_mode, xyz, ids, dir_enc, d_rgb, d_sigma,
        compute_dtype, interpret, tile, tile_flags=tile_flags)
    d_space = _unflatten_grads(s_flat, space_params, spec)
    d_motion = _unflatten_motion_grads(m_flat) if motion_mode else None
    # integer primals take float0 cotangents (jnp.zeros_like(int32) only
    # passed on older jax because the unused cotangent wasn't type-checked)
    flags_ct = (None if tile_flags is None
                else np.zeros(tile_flags.shape, jax.dtypes.float0))
    return (d_space, d_motion, d_xyz.astype(xyz.dtype),
            np.zeros(ids.shape, jax.dtypes.float0)
            if jnp.issubdtype(ids.dtype, jnp.integer) else jnp.zeros_like(ids),
            d_dir.astype(dir_enc.dtype), flags_ct)


field_planar_trainable.defvjp(_vjp_fwd, _vjp_bwd)
