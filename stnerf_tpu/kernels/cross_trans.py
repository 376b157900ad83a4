"""Cross-stream transmittance for the sort-free merged compositor as
Pallas TPU kernels.

``ops.volume.composite_merged_nosort`` (the training compositor) needs, per
ordered stream pair (a, b), the precedence mask ``t[a,n,j] {<=,<} t[b,n,s]``
twice: once reduced against the log transmittance factors (the cross-stream
exclusive-transmittance sum) and once to find each sample's cross-stream
successor depth. The XLA form materializes every (N, S, S) mask cube in HBM
as an einsum operand — L*(L-1) f32 cubes live across the forward AND kept as
backward matmul residuals (~0.35 GB and ~1 GB of HBM traffic per step at
L=3, N=2000, S=120; measured ~2 ms of a ~21 ms train step). These kernels
rebuild each mask in VMEM from the (L, NB, S) depth block — per ray-block a
transient (NB, S, S) compare that never touches HBM — so the only HBM
traffic is the (L, N, S) operands and outputs, and the backward re-derives
the mask from the depths instead of holding cube residuals.

Semantics are pinned to the XLA path (ops/volume.py) bit-for-bit on the
mask/successor logic: ties across streams follow the stable stream order
(``<=`` for a < b, ``<`` for a > b), successor candidates mirror it, and
"no successor" is the same finite 3.4e38 sentinel. Only the reduction order
of the cross sum differs (in-VMEM tree sum vs MXU matmul), a float
reassociation within test tolerance.

Depths are compositing CONSTANTS (the trainer detaches sample positions, as
the reference does), so ``cross_log_transmittance`` differentiates only the
log-factor operand; its backward is one kernel with the transposed mask
reduction. The successor kernel is forward-only.

Gated by ``TPU.COMPOSITOR_KERNEL`` (spec.compositor_kernel); the XLA cube
path stays the default and the golden-parity reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.4e38  # same "no successor" sentinel as ops/volume.py (finite f32)


def _pad_rays(x: jnp.ndarray, block: int) -> jnp.ndarray:
    n = x.shape[1]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


def _ray_grid(L: int, n_pad: int, S: int, block: int):
    spec = pl.BlockSpec((L, block, S), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return (n_pad // block,), spec


def _succ_kernel(L: int, t_ref, out_ref):
    t = t_ref[...].astype(jnp.float32)                      # (L, NB, S)
    for b in range(L):
        nxt = jnp.full(t[b].shape, _INF, jnp.float32)       # cross-only
        for a in range(L):
            if a == b:
                continue
            ta = t[a][:, :, None]                           # (NB, S_j, 1)
            tb = t[b][:, None, :]                           # (NB, 1, S_s)
            # successor candidates, stable-order ties (ops/volume.py:292-295)
            cand = jnp.where(ta > tb if a < b else ta >= tb, ta, _INF)
            nxt = jnp.minimum(nxt, jnp.min(cand, axis=1))
        out_ref[b, :, :] = nxt


def _cross_kernel(L: int, t_ref, logf_ref, out_ref):
    t = t_ref[...].astype(jnp.float32)
    lf = logf_ref[...].astype(jnp.float32)
    for b in range(L):
        acc = jnp.zeros(t[b].shape, jnp.float32)
        for a in range(L):
            if a == b:
                continue
            ta = t[a][:, :, None]
            tb = t[b][:, None, :]
            cube = ta <= tb if a < b else ta < tb           # (NB, S_j, S_s)
            acc = acc + jnp.sum(jnp.where(cube, lf[a][:, :, None], 0.0),
                                axis=1)
        out_ref[b, :, :] = acc


def _cross_bwd_kernel(L: int, t_ref, g_ref, out_ref):
    """d logf[a] = sum_{b != a} mask_ab^T @ d cross[b] — same masks,
    reduced over the b-sample axis instead of the a-sample axis."""
    t = t_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    for a in range(L):
        acc = jnp.zeros(t[a].shape, jnp.float32)
        for b in range(L):
            if b == a:
                continue
            ta = t[a][:, :, None]
            tb = t[b][:, None, :]
            cube = ta <= tb if a < b else ta < tb           # (NB, S_a, S_b)
            acc = acc + jnp.sum(jnp.where(cube, g[b][:, None, :], 0.0),
                                axis=2)
        out_ref[a, :, :] = acc


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def cross_successor(t: jnp.ndarray, block: int = 32,
                    interpret: bool = False) -> jnp.ndarray:
    """Per sample, the smallest depth in any OTHER stream at-or-after it
    (stable-order ties), 3.4e38 where none. t: (L, N, S) -> (L, N, S).
    Forward-only — callers treat depths as compositing constants."""
    L, N, S = t.shape
    tp = _pad_rays(t, block)
    grid, spec = _ray_grid(L, tp.shape[1], S, block)
    out = pl.pallas_call(
        functools.partial(_succ_kernel, L),
        grid=grid, in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(tp.shape, jnp.float32),
        interpret=interpret,
    )(tp)
    return jax.lax.stop_gradient(out[:, :N])


def _cross_call(t, logf, block, interpret):
    L, N, S = t.shape
    tp, lp = _pad_rays(t, block), _pad_rays(logf, block)
    grid, spec = _ray_grid(L, tp.shape[1], S, block)
    out = pl.pallas_call(
        functools.partial(_cross_kernel, L),
        grid=grid, in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(tp.shape, jnp.float32),
        interpret=interpret,
    )(tp, lp)
    return out[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cross_log_transmittance(t: jnp.ndarray, logf: jnp.ndarray,
                            block: int = 32,
                            interpret: bool = False) -> jnp.ndarray:
    """cross[b,n,s] = sum_{a != b} sum_j [t[a,n,j] precedes t[b,n,s]] *
    logf[a,n,j] — the cross-stream part of the union's exclusive log
    transmittance (the own-stream part is a plain exclusive cumsum outside).
    Shapes (L, N, S) throughout. Differentiable in ``logf`` only; ``t`` is
    a compositing constant (zero cotangent)."""
    return _cross_call(t, logf, block, interpret)


def _clt_fwd(t, logf, block, interpret):
    # the mask is derived from depths alone — no cube residuals, and logf
    # itself is not needed by the backward
    return _cross_call(t, logf, block, interpret), t


def _clt_bwd(block, interpret, t, g):
    L, N, S = t.shape
    tp, gp = _pad_rays(t, block), _pad_rays(g, block)
    grid, spec = _ray_grid(L, tp.shape[1], S, block)
    d_logf = pl.pallas_call(
        functools.partial(_cross_bwd_kernel, L),
        grid=grid, in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(tp.shape, jnp.float32),
        interpret=interpret,
    )(tp, gp)
    return jnp.zeros_like(t), d_logf[:, :N]


cross_log_transmittance.defvjp(_clt_fwd, _clt_bwd)
