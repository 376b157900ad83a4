"""SpaceNet — the per-layer radiance field MLP.

Architecture reproduces the reference exactly (ref: modeling/spacenet.py:13-160):

* positional encoding: pos L=10, dir L=4, time L=10 (optionally with the raw
  input prepended, ``include_input``),
* trunk: 4 linears (pos_enc -> W -> ... -> W) with ReLU, then 3 linears on
  ``concat([trunk, pos_enc])`` with ReLU (the classic NeRF skip),
* density head: one linear W -> 1 on the trunk output (raw, no activation —
  relu happens in the compositor),
* rgb head: ReLU(concat([trunk, dir_enc, time_enc])) -> W_h -> 3 (two
  linears; ``deep_rgb`` uses four). Note the leading ReLU also clips the
  encoded directions — a reference quirk preserved for checkpoint parity
  (ref: modeling/spacenet.py:70-86),
* sigmoid on rgb is applied in the volume renderer, not here
  (ref: layers/render_layer.py:47).

Widths default to the reference's 256/128 but are configurable so tests can
run tiny instances.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.encoding import (encoding_dim, positional_encoding,
                            positional_encoding_planar)
from .mlp import init_mlp, linear, linear_planar, mlp, mlp_planar


@dataclasses.dataclass(frozen=True)
class SpaceNetSpec:
    use_dir: bool = True
    use_time: bool = False
    deep_rgb: bool = False
    include_input: bool = True
    backbone_dim: int = 256
    head_dim: int = 128
    pos_freqs: int = 10
    dir_freqs: int = 4
    time_freqs: int = 10

    @property
    def pos_dim(self) -> int:
        return encoding_dim(3, self.pos_freqs, self.include_input)

    @property
    def dir_dim(self) -> int:
        return encoding_dim(3, self.dir_freqs, self.include_input) if self.use_dir else 0

    @property
    def time_dim(self) -> int:
        return encoding_dim(1, self.time_freqs, self.include_input) if self.use_time else 0


def init_spacenet(key: jax.Array, spec: SpaceNetSpec) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    W, H = spec.backbone_dim, spec.head_dim
    rgb_in = W + spec.dir_dim + spec.time_dim
    rgb_dims = [rgb_in, H, H, H, 3] if spec.deep_rgb else [rgb_in, H, 3]
    return {
        "stage1": init_mlp(k1, [spec.pos_dim, W, W, W, W]),
        "stage2": init_mlp(k2, [W + spec.pos_dim, W, W, W]),
        "density": init_mlp(k3, [W, 1]),
        "rgb": init_mlp(k4, rgb_dims),
    }


def apply_spacenet(params: dict, spec: SpaceNetSpec, pos: jnp.ndarray,
                   dirs: jnp.ndarray | None, times: jnp.ndarray | None,
                   dtype=None):
    """Evaluate the field.

    pos: (..., 3) sample positions; dirs: (..., 3) ray directions already
    broadcast to the sample shape (or None); times: (...,) frame ids
    broadcast likewise (or None).
    Returns (rgb (..., 3) raw, sigma (...,) raw).
    """
    p_enc = positional_encoding(pos, spec.pos_freqs, spec.include_input)
    x = mlp(params["stage1"], p_enc, dtype, final_activation=True)
    x = mlp(params["stage2"], jnp.concatenate([x, p_enc.astype(x.dtype)], axis=-1),
            dtype, final_activation=True)
    sigma = linear(params["density"][0], x, dtype)[..., 0]

    feats = [x]
    if spec.use_dir:
        assert dirs is not None
        feats.append(positional_encoding(dirs, spec.dir_freqs, spec.include_input).astype(x.dtype))
    if spec.use_time:
        assert times is not None
        feats.append(positional_encoding(times[..., None], spec.time_freqs,
                                         spec.include_input).astype(x.dtype))
    h = jax.nn.relu(jnp.concatenate(feats, axis=-1))
    rgb = mlp(params["rgb"], h, dtype)
    return rgb.astype(jnp.float32), sigma.astype(jnp.float32)


def apply_spacenet_planar(params: dict, spec: SpaceNetSpec, pos: jnp.ndarray,
                          dirs: jnp.ndarray | None, times: jnp.ndarray | None,
                          dtype=None):
    """Channel-leading evaluation (the TPU-fast layout; see
    ops.encoding.positional_encoding_planar).

    pos: (3, ...) sample positions; dirs: (3, ...) directions broadcast to
    the sample shape (or None); times: (...,) frame ids (or None).
    Returns (rgb (3, ...), sigma (...,)) — identical math to
    :func:`apply_spacenet`, transposed layout.
    """
    p_enc = positional_encoding_planar(pos, spec.pos_freqs, spec.include_input)
    x = mlp_planar(params["stage1"], p_enc, dtype, final_activation=True)
    x = mlp_planar(params["stage2"],
                   jnp.concatenate([x, p_enc.astype(x.dtype)], axis=0),
                   dtype, final_activation=True)
    sigma = linear_planar(params["density"][0], x, dtype)[0]

    feats = [x]
    if spec.use_dir:
        assert dirs is not None
        feats.append(positional_encoding_planar(dirs, spec.dir_freqs,
                                                spec.include_input).astype(x.dtype))
    if spec.use_time:
        assert times is not None
        feats.append(positional_encoding_planar(times[None], spec.time_freqs,
                                                spec.include_input).astype(x.dtype))
    h = jax.nn.relu(jnp.concatenate(feats, axis=0))
    rgb = mlp_planar(params["rgb"], h, dtype)
    return rgb.astype(jnp.float32), sigma.astype(jnp.float32)
