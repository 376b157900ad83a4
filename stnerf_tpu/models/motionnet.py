"""MotionNet — per-layer scene-flow (deformation) MLP.

Maps (x, y, z, id) -> 3-D flow offset added to sample positions before the
radiance field is queried. Architecture mirrors the reference
(ref: modeling/motion_net.py:5-71): positional encoding L=10 over the 4-D
input, then 6 linears (enc -> W x5 -> 3) with ReLU between.

Fractional ids (retiming) blend the *encodings* of floor/ceil frames; this
implementation always uses the blend, which is exactly the direct encoding
at integer ids (see ops.encoding.lerp_encoded_time) — one static code path
instead of the reference's data-dependent branch
(ref: modeling/motion_net.py:49-62).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.encoding import (encoding_dim, lerp_encoded_time,
                            lerp_encoded_time_planar, positional_encoding,
                            positional_encoding_planar)
from .mlp import init_mlp, mlp, mlp_planar


@dataclasses.dataclass(frozen=True)
class MotionNetSpec:
    c_input: int = 4
    include_input: bool = True
    width: int = 128
    freqs: int = 10
    input_time: bool = False  # True: blend encodings at fractional last input

    @property
    def in_dim(self) -> int:
        return encoding_dim(self.c_input, self.freqs, self.include_input)


def init_motionnet(key: jax.Array, spec: MotionNetSpec) -> dict:
    W = spec.width
    return {"net": init_mlp(key, [spec.in_dim, W, W, W, W, W, 3])}


def apply_motionnet(params: dict, spec: MotionNetSpec, xyz: jnp.ndarray,
                    ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """xyz: (..., 3), ids: (...,) camera/frame id -> flow (..., 3)."""
    if spec.input_time:
        enc = lerp_encoded_time(xyz, ids, spec.freqs, spec.include_input)
    else:
        enc = positional_encoding(jnp.concatenate([xyz, ids[..., None]], axis=-1),
                                  spec.freqs, spec.include_input)
    return mlp(params["net"], enc, dtype).astype(jnp.float32)


def apply_motionnet_planar(params: dict, spec: MotionNetSpec, xyz: jnp.ndarray,
                           ids: jnp.ndarray, dtype=None,
                           recursive_enc: bool = False) -> jnp.ndarray:
    """Channel-leading variant: xyz (3, ...), ids (...) -> flow (3, ...)."""
    if spec.input_time:
        enc = lerp_encoded_time_planar(xyz, ids, spec.freqs, spec.include_input,
                                       recursive_enc)
    else:
        enc = positional_encoding_planar(jnp.concatenate([xyz, ids[None]], axis=0),
                                         spec.freqs, spec.include_input,
                                         recursive_enc)
    return mlp_planar(params["net"], enc, dtype).astype(jnp.float32)
