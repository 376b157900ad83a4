"""Ray sampling primitives: AABB intersection, stratified and inverse-CDF
sampling. Pure, static-shape, vmap/jit-friendly.

Replaces the reference's samplers (ref: layers/RaySamplePoint.py:8-107 BBOX
slab test + stratified bins; :155-200 NEAR_FAR midpoint-jitter;
utils/sample_pdf.py:18-63 inverse-CDF fine resampling) with closed-form
vectorized math. Randomness is explicit `jax.random` keys; all samplers have
a deterministic mode for golden tests (mirroring the reference's ``det``
switch, ref: utils/sample_pdf.py:27-29).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MISS_T = -1e3  # the reference parks missed-ray intersection t's at -1e3
               # (ref: layers/RaySamplePoint.py:53); kept for parity.


def ray_aabb_intersect(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       box_min: jnp.ndarray, box_max: jnp.ndarray):
    """Slab-test ray/AABB intersection.

    rays_o, rays_d: (..., 3); box_min/box_max: (..., 3) broadcastable.
    Returns (t_near, t_far, hit). For missed rays t_near = t_far = MISS_T,
    matching the reference's sentinel so downstream sample positions and hit
    masks agree (ref: layers/RaySamplePoint.py:53-62, top-2 of 6 face t's).
    """
    eps = jnp.asarray(2.220446049250313e-16, rays_d.dtype)  # np.finfo(float).eps
    inv_d = 1.0 / (rays_d + eps)
    t1 = (box_min - rays_o) * inv_d
    t2 = (box_max - rays_o) * inv_d
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = t_far > t_near
    # Degenerate/missed rays collapse to the sentinel; the derived bin width
    # becomes 0 so the hit mask below matches the reference's |width|>1e-5.
    t_near = jnp.where(hit, t_near, MISS_T)
    t_far = jnp.where(hit, t_far, MISS_T)
    return t_near, t_far, hit


def stratified_between(t_start: jnp.ndarray, t_end: jnp.ndarray, num: int,
                       key: jax.Array | None = None):
    """Stratified-jittered samples in [t_start, t_end].

    t_start/t_end: (N,). Returns t: (N, num). The reference draws u~U[0,1)
    per bin and places t = (bin_idx + u) * width + start
    (ref: layers/RaySamplePoint.py:87-102); deterministic mode (``key=None``)
    uses u=0.5, i.e. bin centers.
    """
    n = t_start.shape[0]
    bins = jnp.arange(num, dtype=t_start.dtype)[None, :]
    if key is None:
        u = jnp.full((n, num), 0.5, t_start.dtype)
    else:
        u = jax.random.uniform(key, (n, num), t_start.dtype)
    width = ((t_end - t_start) / num)[:, None]
    return (bins + u) * width + t_start[:, None]


def stratified_near_far(near: jnp.ndarray, far: jnp.ndarray, num: int,
                        key: jax.Array | None = None):
    """Classic NeRF stratified sampling with midpoint jitter.

    near/far: (N,). Linspace between near/far, then jitter each sample within
    the interval bounded by neighbor midpoints (ref:
    layers/RaySamplePoint.py:179-195). Deterministic mode keeps the linspace.
    """
    n = near.shape[0]
    t_vals = jnp.linspace(0.0, 1.0, num, dtype=near.dtype)[None, :]
    z = near[:, None] * (1.0 - t_vals) + far[:, None] * t_vals
    if key is None:
        return z
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
    lower = jnp.concatenate([z[:, :1], mids], axis=-1)
    u = jax.random.uniform(key, (n, num), near.dtype)
    return lower + (upper - lower) * u


def stratified_union(t_near: jnp.ndarray, t_far: jnp.ndarray,
                     hit: jnp.ndarray, num: int,
                     key: jax.Array | None = None):
    """Stratified samples over the UNION of K per-ray intervals (gap skip).

    t_near/t_far/hit: (N, K) slice-intersection intervals in arbitrary
    order — they may overlap (occupancy sub-boxes are dilated by
    ``pad_voxels``) or be exact duplicates (a box replicated across the
    slice axis). Returns t: (N, num), ascending along the ray. Rays that
    hit no interval return all MISS_T, matching
    :func:`ray_aabb_intersect`'s sentinel.

    The K intervals are union-merged (sort by entry, clamp each start to
    the running max exit) so the sampled measure is the measure of the
    union: stratified bins are laid over the concatenated occupied length
    and mapped back to ray t — samples land only inside occupied slices
    and the budget densifies on the matter. When the slices tile one box
    (occupancy ``tau=0``) the union is a single contiguous interval and
    this reduces to :func:`stratified_between` over [min enter, max exit]
    (up to fp association). Sorting and gathers stay TPU-cheap: K is tiny,
    the sort is one variadic ``lax.sort`` and the per-sample interval
    lookup is a comparison count + one-hot contraction (same trick as
    :func:`sample_pdf`).

    Approximation note (vs sampling the hull interval): the compositor's
    delta for the last sample before a skipped gap spans the gap, so that
    sample's alpha is overweighted — by construction it sits in a voxel
    the occupancy grid found BELOW tau after dilation, bounding the error
    like the box shrink itself (see render/occupancy.py). Opt-in via
    ``TPU.OCC_GAP_SKIP``.
    """
    n, K = t_near.shape
    # parking value for misses: far beyond any scene t, but comfortably
    # finite even if a downstream op ever downcasts to bf16 (max 3.39e38 —
    # an earlier 3.4e38 rounded to inf inside the default-precision one-hot
    # einsum on TPU, and 0 * inf = NaN poisoned every sample of any ray
    # with at least one missed slice; found via the loose-hull A/B, 8.6 dB)
    big = jnp.asarray(1e30, t_near.dtype)
    # park misses at +inf entry / -inf exit: they sort to the tail and
    # union-merge to zero length without poisoning the running max
    k_n = jnp.where(hit, t_near, big)
    k_f = jnp.where(hit, t_far, -big)
    s_n, s_f = jax.lax.sort([k_n, k_f], dimension=1, num_keys=1)
    run_excl = jnp.concatenate(
        [jnp.full((n, 1), -big, t_near.dtype),
         jax.lax.cummax(s_f, axis=1)[:, :-1]], axis=1)
    eff_start = jnp.maximum(s_n, run_excl)
    length = jnp.maximum(s_f - eff_start, 0.0)
    cum = jnp.cumsum(length, axis=1)                        # (N, K) inclusive
    total = cum[:, -1:]

    bins = jnp.arange(num, dtype=t_near.dtype)[None, :]
    if key is None:
        u01 = jnp.full((n, num), 0.5, t_near.dtype)
    else:
        u01 = jax.random.uniform(key, (n, num), t_near.dtype)
    # In f32, (bins + u01)/num rounds UP to exactly 1.0 when the last bin's
    # draw is within ~2^-18 of 1, so u would hit `total` exactly and the
    # interval lookup would run off the end (sample emitted at t = total, a
    # union-measure length, not a ray t). Clamp the normalized position
    # strictly below 1 with margin 2^-20 (>> the 2^-24 f32 rounding step) so
    # u < total for every normal positive total.
    q = jnp.minimum((bins + u01) / num, 1.0 - 2.0 ** -20)
    u = q * total                                           # (N, num) < total

    # interval index by comparison count over the first K-1 boundaries:
    # structurally idx <= K-1 even if u somehow reached total. Zero-length
    # merged intervals share their boundary with the predecessor, so the
    # count skips them for any u strictly inside the union.
    idx = jnp.sum((cum[:, :-1, None] <= u[:, None, :]).astype(jnp.int32),
                  axis=1)
    cum_before = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]],
                                 axis=1)
    span = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    onehot = (idx[..., None] == span).astype(t_near.dtype)  # (N, num, K)
    table = jnp.stack([eff_start, cum_before, length], axis=-1)  # (N, K, 3)
    # HIGHEST: this gather must return the table values bit-exactly — TPU's
    # default bf16 matmul precision quantizes eff_start/cum_before (~0.4%
    # rel), which is the same magnitude as a 48-sample stride over the
    # union and breaks per-ray monotonicity of the emitted t
    g = jnp.einsum("nsk,nkj->nsj", onehot, table,
                   precision=jax.lax.Precision.HIGHEST)
    # clamp the in-interval offset by the interval's length: t always lies
    # inside the selected interval, so even a rounding escape cannot emit a
    # point in a skipped gap (monotonicity in u is preserved: offset clamp
    # only saturates at the interval's far end).
    t = g[..., 0] + jnp.clip(u - g[..., 1], 0.0, g[..., 2])
    return jnp.where(total > 0, t, MISS_T)


def sample_pdf(z_vals: jnp.ndarray, weights: jnp.ndarray, num: int,
               key: jax.Array | None = None):
    """Inverse-CDF importance sampling of the coarse weights.

    z_vals: (N, S), weights: (N, S-2) (interior weights, the caller drops the
    first/last sample as the reference does, ref:
    modeling/layered_rfrender.py:460). Returns (N, num) new sample depths.

    Bins are the midpoints of z_vals; pdf -> cdf -> searchsorted(right) ->
    linear interpolation (ref: utils/sample_pdf.py:18-63). ``key=None``
    reproduces the reference's det mode (u = linspace).
    """
    bins = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])          # (N, S-1)
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N, S-1)

    if key is None:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, num, dtype=z_vals.dtype),
                             (*cdf.shape[:-1], num))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], num), z_vals.dtype)

    # searchsorted(right) as a comparison count: O(S_c * S_f) VPU ops beat a
    # vmapped binary search (dynamic gathers) ~3x on TPU at render scale.
    inds = jnp.sum((cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32),
                   axis=-2)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    # gather cdf/bins at below/above via one-hot contractions (MXU) instead
    # of lane-dim take_along_axis (cdf and bins share the width S-1).
    table = jnp.stack([cdf, bins], axis=-1)                # (N, S-1, 2)
    span = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cdf.shape[-1]), 2)

    def pick(idx):
        onehot = (idx[..., None] == span).astype(table.dtype)  # (N, S_f, S_c)
        # HIGHEST: gathered cdf values feed a (u - cdf_b)/denom with
        # denom >= 1e-5 — bf16-default quantization (~2^-8 rel) of cdf/bins
        # would dominate the interpolation
        return jnp.einsum("nfc,nck->nfk", onehot, table,
                          precision=jax.lax.Precision.HIGHEST)

    g_b, g_a = pick(below), pick(above)
    cdf_b, bins_b = g_b[..., 0], g_b[..., 1]
    cdf_a, bins_a = g_a[..., 0], g_a[..., 1]

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def points_along_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray, t: jnp.ndarray):
    """xyz = o + t*d. rays_o/rays_d: (N, 3), t: (N, S) -> (N, S, 3)."""
    return rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
