"""NeRF positional (trigonometric) encoding.

Matches the reference encoder semantics exactly (ref: utils/dimension_kernel.py:3-51):
log-spaced frequencies 2^0 .. 2^(L-1), feature order
``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]`` with the raw
input optionally prepended. Implemented as a single fused outer-product —
one VPU-friendly op instead of the reference's list of lambdas.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def encoding_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dim * ((1 if include_input else 0) + 2 * num_freqs)


@functools.partial(jnp.vectorize, signature="(d)->(e)", excluded=(1, 2))
def _encode_vec(x, num_freqs, include_input):  # pragma: no cover - thin wrapper
    return positional_encoding(x, num_freqs, include_input)


def positional_encoding(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """Encode ``x``'s last axis. (..., d) -> (..., d * (include + 2L)).

    Frequency-major interleave: for each frequency f: sin(f*x_0..d), cos(f*x_0..d),
    mirroring the reference's per-frequency [sin, cos] loop over full vectors.
    """
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    # Concatenation form: a stack+reshape over minor dims compiles to layout
    # transposes that are catastrophically slow on TPU at NeRF sample counts;
    # a flat concat of (..., d) pieces lowers to pure VPU code.
    pieces = [x] if include_input else []
    for i in range(num_freqs):
        xf = x * jnp.asarray(2.0**i, x.dtype)
        pieces.append(jnp.sin(xf))
        pieces.append(jnp.cos(xf))
    return jnp.concatenate(pieces, axis=-1)


def positional_encoding_planar(x: jnp.ndarray, num_freqs: int,
                               include_input: bool = True,
                               recursive: bool = False) -> jnp.ndarray:
    """Channel-leading encoding: (C, ...) -> (C * (include + 2L), ...).

    TPU tiles the last two axes; tensors with a tiny trailing channel axis
    (e.g. (M, 3)) are padded up to 43x in HBM. Keeping channels on the
    *leading* axis makes every intermediate (C', N, S)-shaped with large
    minor dims — no padding. Channel order matches
    :func:`positional_encoding` ([x | sin(f0 x) | cos(f0 x) | ...]).

    ``recursive=True`` derives sin/cos(2^k x) by double-angle recursion from
    one sin/cos pair (3 multiplies per octave instead of 2 transcendentals;
    f32 recursion error ~2^L*eps, well under bf16 resolution) — used on the
    TPU training hot path; the default exact form is the golden-parity path.
    """
    if num_freqs == 0:
        return x if include_input else x[:0]
    pieces = [x] if include_input else []
    if recursive:
        s, c = jnp.sin(x), jnp.cos(x)
        pieces += [s, c]
        for _ in range(num_freqs - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            pieces += [s, c]
        return jnp.concatenate(pieces, axis=0)
    for i in range(num_freqs):
        xf = x * jnp.asarray(2.0**i, x.dtype)
        pieces.append(jnp.sin(xf))
        pieces.append(jnp.cos(xf))
    return jnp.concatenate(pieces, axis=0)


def lerp_encoded_time_planar(xyz: jnp.ndarray, t: jnp.ndarray, num_freqs: int,
                             include_input: bool = True,
                             recursive: bool = False) -> jnp.ndarray:
    """Planar variant of :func:`lerp_encoded_time`: xyz (C, ...), t (...)
    -> ((C+1)*(include+2L), ...)."""
    lower = jnp.floor(t)
    w = t - lower
    e_lo = positional_encoding_planar(
        jnp.concatenate([xyz, lower[None]], axis=0), num_freqs, include_input,
        recursive)
    e_hi = positional_encoding_planar(
        jnp.concatenate([xyz, (lower + 1.0)[None]], axis=0), num_freqs,
        include_input, recursive)
    return (1.0 - w) * e_lo + w * e_hi


def lerp_encoded_time(xyz: jnp.ndarray, t: jnp.ndarray, num_freqs: int,
                      include_input: bool = True) -> jnp.ndarray:
    """Encode (xyz, t) with temporal interpolation at fractional ``t``.

    The reference's MotionNet encodes (xyz, floor(t)) and (xyz, ceil(t)) and
    linearly blends the *encodings* (ref: modeling/motion_net.py:49-62). At
    integer ``t`` the blend degenerates to the direct encoding, so this single
    code path replaces the reference's data-dependent branch — crucial for a
    trace-once XLA program.

    xyz: (..., c), t: (...,) -> (..., enc_dim(c+1)).
    """
    lower = jnp.floor(t)
    w = (t - lower)[..., None]
    e_lo = positional_encoding(jnp.concatenate([xyz, lower[..., None]], axis=-1),
                               num_freqs, include_input)
    e_hi = positional_encoding(jnp.concatenate([xyz, (lower + 1.0)[..., None]], axis=-1),
                               num_freqs, include_input)
    return (1.0 - w) * e_lo + w * e_hi
