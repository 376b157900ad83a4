"""Volume rendering (alpha compositing) and the layered depth-sort merge.

Numerics follow the reference exactly so that imported checkpoints render
pixel-faithfully:

* ``alpha = 1 - exp(-relu(sigma) * delta)``, transmittance via *exclusive*
  cumulative product of ``(1 - alpha + 1e-10)`` (ref: layers/render_layer.py:8-17),
* the last delta is padded with ``boarder_weight`` (default 1e10)
  (ref: layers/render_layer.py:37-40),
* ``sigmoid`` is applied to the raw rgb *here*, inside the compositor
  (ref: layers/render_layer.py:47), not in the field MLP.

The cross-layer merge concatenates every layer's sample depths along the
sample axis and sorts (t, rgb, sigma) jointly with a single multi-operand
``lax.sort`` — the XLA-native equivalent of the reference's
``torch.sort`` + three ``gather`` calls (ref: modeling/layered_rfrender.py:425-429).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RenderedRays(NamedTuple):
    color: jnp.ndarray    # (N, 3)
    depth: jnp.ndarray    # (N, 1)
    acc: jnp.ndarray      # (N, 1)   accumulated alpha
    weights: jnp.ndarray  # (N, S, 1)


@jax.custom_vjp
def _cumprod_bounded(f: jnp.ndarray) -> jnp.ndarray:
    """``jnp.cumprod(f, axis=-1)`` with a closed-form backward.

    Valid ONLY for transmittance factors ``1 - alpha + 1e-10``. XLA
    differentiates the log-depth prefix network of the stock cumprod —
    measured 10.97 ms fwd+bwd vs 1.37 ms for this form at (3, 2000, 120) on
    a v5e chip (8x). With P = cumprod(f):
    dL/df_i = (Σ_{m≥i} dP_m·P_m) / f_i — one reversed cumsum and a divide,
    both a single VPU pass.

    The divide is clamped to 1e-10: under jit, XLA's algebraic simplifier
    reassociates ``(1 - alpha) + 1e-10`` into ``(1 + 1e-10) - alpha`` and
    const-folds ``1 + 1e-10`` to ``1.0`` in f32 — so fully-saturated samples
    (alpha == 1, e.g. at the 1e10 boarder delta) reach this function as
    EXACT zeros despite the source-level epsilon. Clamping reproduces the
    intended epsilon math; the gradient this approximates is multiplied
    downstream by ``d alpha/d sigma = delta * exp(-sigma*delta)``, whose exp
    has underflowed to 0 wherever f hit the floor, so the approximation
    never reaches a parameter.
    """
    return jnp.cumprod(f, axis=-1)


def _cumprod_bounded_fwd(f):
    P = jnp.cumprod(f, axis=-1)
    return P, (f, P)


def _cumprod_bounded_bwd(res, dP):
    f, P = res
    s = jnp.cumsum((dP * P)[..., ::-1], axis=-1)[..., ::-1]
    return (s / jnp.maximum(f, jnp.asarray(1e-10, f.dtype)),)


_cumprod_bounded.defvjp(_cumprod_bounded_fwd, _cumprod_bounded_bwd)


def render_weights(sigma: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Per-sample compositing weights from raw density and segment lengths.

    sigma, delta: (N, S) -> weights (N, S).
    """
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * delta)
    trans = 1.0 - alpha + 1e-10
    # Exclusive cumprod: prepend ones, drop the last term.
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]),
                             _cumprod_bounded(trans)[:, :-1]], axis=-1)
    return alpha * trans


def volume_render(t: jnp.ndarray, rgb: jnp.ndarray, sigma: jnp.ndarray,
                  boarder_weight: float = 1e10) -> RenderedRays:
    """Composite one set of sorted samples along each ray.

    t: (N, S) sample depths (sorted ascending), rgb: (N, S, 3) raw (pre-
    sigmoid) colors, sigma: (N, S) raw densities. Keeping t/sigma rank-2
    (instead of the reference's trailing singleton dims) lets XLA lay the
    sample axis out on lanes.
    """
    delta = t[:, 1:] - t[:, :-1]
    pad = jnp.full_like(delta[:, :1], boarder_weight)
    delta = jnp.concatenate([delta, pad], axis=-1)           # (N, S)

    w = render_weights(sigma, delta)                          # (N, S)
    color = jnp.einsum("ns,nsc->nc", w, jax.nn.sigmoid(rgb),
                       precision=jax.lax.Precision.HIGHEST)
    depth = jnp.sum(w * t, axis=-1, keepdims=True)
    acc = jnp.sum(w, axis=-1, keepdims=True)
    return RenderedRays(color, depth, acc, w[..., None])


def merge_layers(t: jnp.ndarray, rgb: jnp.ndarray, sigma: jnp.ndarray):
    """Depth-sort the union of all layers' samples.

    t: (L, N, S), rgb: (L, N, S, 3), sigma: (L, N, S)
    -> (t, rgb, sigma) with shapes (N, L*S), (N, L*S, 3), (N, L*S), sorted by
    t ascending along the merged sample axis.
    """
    L, N, S = t.shape
    t_cat = jnp.moveaxis(t, 0, 1).reshape(N, L * S)
    sig_cat = jnp.moveaxis(sigma, 0, 1).reshape(N, L * S)
    rgb_cat = jnp.moveaxis(rgb, 0, 1).reshape(N, L * S, 3)
    # Variadic sort carries the payload through the comparator network as
    # pure vector ops — measured ~12x faster at runtime than argsort +
    # take_along_axis gathers on TPU (lane-dim gathers are slow). The
    # heavier one-off compile is absorbed by the persistent cache.
    t_s, r_s, g_s, b_s, sig_s = jax.lax.sort(
        (t_cat, rgb_cat[..., 0], rgb_cat[..., 1], rgb_cat[..., 2], sig_cat),
        dimension=-1, num_keys=1)
    return t_s, jnp.stack([r_s, g_s, b_s], axis=-1), sig_s


def volume_render_planar(t: jnp.ndarray, rgb: jnp.ndarray, sigma: jnp.ndarray,
                         boarder_weight: float = 1e10) -> RenderedRays:
    """Channel-leading compositor: rgb is (3, N, S) (no trailing tiny axis —
    TPU tile-padding free). Same math as :func:`volume_render`."""
    delta = t[:, 1:] - t[:, :-1]
    pad = jnp.full_like(delta[:, :1], boarder_weight)
    delta = jnp.concatenate([delta, pad], axis=-1)

    w = render_weights(sigma, delta)                          # (N, S)
    color = jnp.einsum("ns,cns->nc", w, jax.nn.sigmoid(rgb),
                       precision=jax.lax.Precision.HIGHEST)
    depth = jnp.sum(w * t, axis=-1, keepdims=True)
    acc = jnp.sum(w, axis=-1, keepdims=True)
    return RenderedRays(color, depth, acc, w[..., None])


def merge_layers_planar(t: jnp.ndarray, rgb: jnp.ndarray, sigma: jnp.ndarray):
    """Depth-sort merge, channel-leading rgb.

    t: (L, N, S), rgb: (L, 3, N, S), sigma: (L, N, S)
    -> t (N, L*S), rgb (3, N, L*S), sigma (N, L*S), sorted by t.
    """
    L, N, S = t.shape
    t_cat = jnp.moveaxis(t, 0, 1).reshape(N, L * S)
    sig_cat = jnp.moveaxis(sigma, 0, 1).reshape(N, L * S)
    rgb_cat = jnp.moveaxis(rgb, 0, 2).reshape(3, N, L * S)
    t_s, r_s, g_s, b_s, sig_s = jax.lax.sort(
        (t_cat, rgb_cat[0], rgb_cat[1], rgb_cat[2], sig_cat),
        dimension=-1, num_keys=1)
    return t_s, jnp.stack([r_s, g_s, b_s], axis=0), sig_s


def composite_streams_nosort(streams, boarder_weight: float = 1e10
                             ) -> RenderedRays:
    """Exact union compositing of several per-ray ascending sample streams
    WITHOUT sorting — the core of the training compositors.

    ``streams``: sequence of ``(t (N, S_i), rgb (3, N, S_i), sigma (N, S_i))``
    with each stream's depths ascending per ray (stream lengths may differ).
    Numerically equivalent (up to float product reassociation) to sorting
    the union of all streams and running :func:`volume_render_planar`: the
    union's exclusive transmittance at a sample factorizes into each
    stream's own cumulative product evaluated at that depth, and the union
    segment length is the distance to the nearest next sample across
    streams.

    Why it exists: ``lax.sort``'s VJP applies the inverse permutation with
    lane-dimension gathers — ~10x the forward cost on TPU (measured 2.4 ms
    fwd vs 23.7 ms fwd+bwd at L=3, N=2000, S=120). The depths are
    stop-gradient (as in training: ref trainer detaches sample positions),
    so every depth comparison is a constant, and the cross-stream
    transmittance is an exp of cube-masked log-factor sums — per (a, b)
    pair one (N,S_a,S_b)x(N,S_a) batched matmul whose backward is the
    transposed matmul (MXU both ways; an earlier one-hot-gather-of-cumprod
    form was HBM-bound on its (N, S, S+1) one-hot cubes). Ties across
    streams follow the stable stream order except between equal depths
    with nonzero density (measure-zero under jittered sampling).

    ``weights`` in the result is the per-stream weights concatenated in
    stream order, ``(N, sum(S_i), 1)``.
    """
    M = len(streams)
    ts = [jax.lax.stop_gradient(s[0]) for s in streams]
    rgbs = [s[1] for s in streams]
    sigs = [s[2] for s in streams]
    N = ts[0].shape[0]
    inf = jnp.float32(3.4e38)

    # Per-stream union successor: from stream a at b's samples, the min of
    # a's depths strictly/weakly after (stable order: > for a<b would skip
    # a's own equal value, but equal values of a precede b when a<b, so the
    # next *distinct* element is > t_b; for a>b equal values follow b, so
    # >= t_b qualifies). Forward-only constants — the (N, S_a, S_b)
    # comparison cubes here are temporaries, each consumed by its min().
    nxt = [jnp.concatenate([t[:, 1:], jnp.full((N, 1), inf)], -1)
           for t in ts]
    for a in range(M):
        for b in range(M):
            if a == b:
                continue
            above = jnp.where(ts[a][:, :, None] >= ts[b][:, None, :],
                              ts[a][:, :, None], inf) if a > b else \
                jnp.where(ts[a][:, :, None] > ts[b][:, None, :],
                          ts[a][:, :, None], inf)
            nxt[b] = jnp.minimum(nxt[b], jnp.min(above, axis=1))
    deltas = [jax.lax.stop_gradient(
        jnp.where(jnp.isfinite(nxt[b]), nxt[b] - ts[b], boarder_weight))
        for b in range(M)]

    alphas = [1.0 - jnp.exp(-jax.nn.relu(sig) * d)
              for sig, d in zip(sigs, deltas)]
    fs = [1.0 - a + 1e-10 for a in alphas]
    # Log-space transmittance: the union's exclusive transmittance at b's
    # sample s factorizes into per-stream products of the factors of samples
    # preceding it — i.e. exp of a cube-masked SUM of log factors. The
    # cross-stream contraction is one (N,S_a,S_b)x(N,S_a) batched matmul per
    # pair (MXU, transposed matmul backward) — replacing the (N, S, S+1)
    # one-hot gather cubes of cumprod values, whose HBM traffic dominated
    # the compositor. The max() guards the epsilon XLA const-folds away (see
    # _cumprod_bounded): saturated factors reach here as exact zeros and
    # log would give -inf (0 * -inf = NaN in the backward).
    logfs = [jnp.log(jnp.maximum(f, 1e-10)) for f in fs]

    def _cross_logT(ts, logfs):
        # The M*(M-1) constant precedence cubes (cube[a][b]: a's sample
        # precedes b's, f32 0/1, (N, S_a, S_b) each) live ONLY inside this
        # checkpointed region: each is a temporary consumed by one einsum
        # forward, and the backward recomputes them from ts (stop-gradient
        # constants) instead of keeping them as matmul residuals. Peak
        # residual memory is O(sum S_i) per ray instead of quadratic in S
        # (was ~0.35 GB of live cubes at M=3, N=2000, S=120).
        logT = [jnp.concatenate([jnp.zeros((N, 1), lf.dtype),
                                 jnp.cumsum(lf, axis=-1)[:, :-1]], axis=-1)
                for lf in logfs]
        for a in range(M):
            for b in range(M):
                if a == b:
                    continue
                cube = ts[a][:, :, None] <= ts[b][:, None, :] if a < b \
                    else ts[a][:, :, None] < ts[b][:, None, :]
                logT[b] = logT[b] + jnp.einsum(
                    "njs,nj->ns", cube.astype(jnp.float32), logfs[a])
        return tuple(logT)

    logT = jax.checkpoint(_cross_logT)(tuple(ts), tuple(logfs))

    ws = [al * jnp.exp(lt) for al, lt in zip(alphas, logT)]   # (N, S_b) each
    color = sum(jnp.einsum("ns,cns->nc", w, jax.nn.sigmoid(r),
                           precision=jax.lax.Precision.HIGHEST)
                for w, r in zip(ws, rgbs))
    depth = sum(jnp.sum(w * t, axis=-1) for w, t in zip(ws, ts))[:, None]
    acc = sum(jnp.sum(w, axis=-1) for w in ws)[:, None]
    weights = jnp.concatenate(ws, axis=-1)[..., None]
    return RenderedRays(color, depth, acc, weights)


def composite_merged_nosort(t: jnp.ndarray, rgb: jnp.ndarray,
                            sigma: jnp.ndarray,
                            boarder_weight: float = 1e10,
                            kernel: bool = False,
                            interpret: bool = False) -> RenderedRays:
    """Merged-layer compositing WITHOUT the cross-layer sort — the training
    path's compositor; the equal-length-streams case of
    :func:`composite_streams_nosort` (one stream per layer).

    Numerically equivalent (up to float product reassociation) to
    ``volume_render_planar(*merge_layers_planar(t, rgb, sigma))``
    (ref merge: modeling/layered_rfrender.py:425-429).

    Kept as a separate stacked-tensor implementation rather than delegating
    to :func:`composite_streams_nosort`: per-stream (N, S) elementwise ops
    change XLA's fusion shapes around the trainable Pallas field kernel and
    push its cond-branch scoped-VMEM allocation past the 16 MB limit at
    production batch shapes (observed: 16.24M vs 16.00M — a compile-time
    OOM). The stacked (L, N, S) form keeps the exact-path HLO stable; both
    forms are pinned to the sorted reference by tests/test_ops.py.

    t: (L, N, S) per-layer ascending depths (treated as constants);
    rgb: (L, 3, N, S) raw; sigma: (L, N, S) raw. ``weights`` in the result
    is layer-major (N, L*S, 1) (unsorted order).

    ``kernel=True`` computes the cross-stream successor and transmittance
    terms with the Pallas kernels in kernels/cross_trans.py (masks rebuilt
    in VMEM instead of L*(L-1) HBM-resident (N, S, S) einsum cubes); same
    semantics, float-reassociated sums. The XLA cube path stays the default
    and the golden-parity form.
    """
    L, N, S = t.shape
    inf = jnp.float32(3.4e38)
    t = jax.lax.stop_gradient(t)
    t_next_own = jnp.concatenate([t[:, :, 1:], jnp.full((L, N, 1), inf)], -1)

    if kernel:
        from ..kernels.cross_trans import (cross_log_transmittance,
                                           cross_successor)
        nxt_s = jnp.minimum(t_next_own,
                            cross_successor(t, interpret=interpret))
        delta = jax.lax.stop_gradient(
            jnp.where(jnp.isfinite(nxt_s), nxt_s - t, boarder_weight))
        alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * delta)
        f = 1.0 - alpha + 1e-10
        logf = jnp.log(jnp.maximum(f, 1e-10))                # (L, N, S)
        excl = jnp.concatenate([jnp.zeros((L, N, 1), logf.dtype),
                                jnp.cumsum(logf, axis=-1)[..., :-1]],
                               axis=-1)
        T = jnp.exp(excl + cross_log_transmittance(t, logf,
                                                   interpret=interpret))
    else:
        nxt = [t_next_own[b] for b in range(L)]  # per-layer merged successor
        cubes = [[None] * L for _ in range(L)]   # cube[a][b]: a precedes b
        for a in range(L):
            for b in range(L):
                if a == b:
                    continue
                cube = t[a][:, :, None] <= t[b][:, None, :] if a < b else \
                       t[a][:, :, None] < t[b][:, None, :]   # (N, S_a, S_b)
                cubes[a][b] = cube.astype(jnp.float32)
                above = jnp.where(cube, inf, t[a][:, :, None]) if a > b else \
                    jnp.where(t[a][:, :, None] > t[b][:, None, :],
                              t[a][:, :, None], inf)
                nxt[b] = jnp.minimum(nxt[b], jnp.min(above, axis=1))
        delta = [jnp.where(jnp.isfinite(nxt[b]), nxt[b] - t[b],
                           boarder_weight) for b in range(L)]
        delta = jax.lax.stop_gradient(jnp.stack(delta))      # (L, N, S)

        alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * delta)
        f = 1.0 - alpha + 1e-10
        logf = jnp.log(jnp.maximum(f, 1e-10))                # (L, N, S)
        excl = jnp.concatenate([jnp.zeros((L, N, 1), logf.dtype),
                                jnp.cumsum(logf, axis=-1)[..., :-1]],
                               axis=-1)
        logT = [excl[b] for b in range(L)]
        for a in range(L):
            for b in range(L):
                if a == b:
                    continue
                logT[b] = logT[b] + jnp.einsum("njs,nj->ns", cubes[a][b],
                                               logf[a])
        T = jnp.exp(jnp.stack(logT))

    w = alpha * T                                             # (L, N, S)
    color = jnp.einsum("lns,lcns->nc", w, jax.nn.sigmoid(rgb),
                       precision=jax.lax.Precision.HIGHEST)
    depth = jnp.sum(w * t, axis=(0, 2))[:, None]
    acc = jnp.sum(w, axis=(0, 2))[:, None]
    weights = jnp.moveaxis(w, 0, 1).reshape(N, L * S)[..., None]
    return RenderedRays(color, depth, acc, weights)


def sort_samples_planar(t: jnp.ndarray, rgb: jnp.ndarray, sigma: jnp.ndarray):
    """Per-ray ascending depth sort carrying the sample payload.

    t: (L, N, S), rgb: (L, 3, N, S), sigma: (L, N, S) -> same shapes with
    each ray's samples sorted by t along the last axis. One variadic
    ``lax.sort`` (the payload rides the comparator network — see
    :func:`merge_layers_planar` for why this beats argsort+gather on TPU).
    Used by the fast fine render path, which concatenates unevaluated-order
    coarse-carried and importance samples before compositing.
    """
    t_s, r_s, g_s, b_s, sig_s = jax.lax.sort(
        (t, rgb[:, 0], rgb[:, 1], rgb[:, 2], sigma), dimension=-1, num_keys=1)
    return t_s, jnp.stack([r_s, g_s, b_s], axis=1), sig_s


def sort_merge_t(t_a: jnp.ndarray, t_b: jnp.ndarray) -> jnp.ndarray:
    """Sorted union of two per-ray depth sets ((N,S1),(N,S2)->(N,S1+S2)).

    Used to fold fine samples back into the coarse set
    (ref: modeling/layered_rfrender.py:462).
    """
    return jax.lax.sort(jnp.concatenate([t_a, t_b], axis=-1), dimension=-1)
