"""Plain-pytree linear layers.

Parameters are nested dicts of jnp arrays (no framework classes), so they
compose directly with jit/vmap/pjit and stack cleanly along a leading "layer"
axis for the multi-field batched evaluation.

Initialization matches torch ``nn.Linear`` defaults — weight and bias both
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — so fresh models start in the same
regime as the reference's. Weights are stored as (in, out); the torch
checkpoint importer transposes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def init_linear(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def init_mlp(key: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> list:
    """A stack of linears: dims = [in, h1, ..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [init_linear(k, a, b, dtype) for k, a, b in zip(keys, dims[:-1], dims[1:])]


def linear(p: dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """y = x @ w + b, optionally computing the matmul in ``dtype``
    (bfloat16 on the MXU) with float32 accumulation."""
    w, b = p["w"], p["b"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


def mlp(params: list, x: jnp.ndarray, dtype=None,
        final_activation: bool = False) -> jnp.ndarray:
    """ReLU-separated linear stack; ReLU after every layer except the last
    unless ``final_activation``."""
    n = len(params)
    for i, p in enumerate(params):
        x = linear(p, x, dtype)
        if i < n - 1 or final_activation:
            x = jax.nn.relu(x)
    return x


# -- planar (feature-leading) variants ---------------------------------------
# Activations are (features, ...batch) so the big batch axes stay on the TPU
# lane/sublane dims — no tile padding for small feature counts.

def linear_planar(p: dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """y = w^T @ x + b[:, None]; x: (in, M) -> (out, M)."""
    w, b = p["w"], p["b"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype).reshape(b.shape[0], *([1] * (y.ndim - 1)))


def mlp_planar(params: list, x: jnp.ndarray, dtype=None,
               final_activation: bool = False) -> jnp.ndarray:
    n = len(params)
    for i, p in enumerate(params):
        x = linear_planar(p, x, dtype)
        if i < n - 1 or final_activation:
            x = jax.nn.relu(x)
    return x
