"""Chunked full-image rendering driver.

Replaces the reference's host-side python chunk loop
(ref: utils/batchify_rays.py:51-140) with a single device program: rays are
padded and reshaped to (n_chunks, chunk, ...) and a ``lax.map`` streams the
fixed-size chunks through the render core *entirely on device* — one host
upload and one download per frame instead of per chunk (host<->TPU transfers
through this environment's tunnel cost ~1s per chunk, dwarfing compute).

With a multi-device mesh the per-chunk ray axis is sharded across the
``data`` axis; parameters are replicated, so no collectives appear in the
forward pass at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import EditState, RayInputs, RenderOutputs, SceneBoxes, render_rays
from ..models.layered import LayeredSpec
from ..parallel import DATA_AXIS


@functools.partial(jax.jit, static_argnames=("spec", "only_coarse"))
def _render_frame(params, spec: LayeredSpec, scene, chunked_inputs, edits,
                  key, only_coarse=False):
    """chunked_inputs leaves are (n_chunks, chunk, ...)."""
    n_chunks = chunked_inputs.rays_o.shape[0]
    keys = (jax.random.split(key, n_chunks) if key is not None
            else jnp.zeros((n_chunks, 2), jnp.uint32))

    def one(args):
        inp, k = args
        kk = None if key is None else k
        return render_rays(params, spec, scene, inp, edits, kk,
                           only_coarse=only_coarse)

    return jax.lax.map(one, (chunked_inputs, keys))


# kept for compile-cache continuity and tests that drive one chunk directly
@functools.partial(jax.jit, static_argnames=("spec", "only_coarse"))
def _render_chunk(params, spec: LayeredSpec, scene, inputs, edits, key,
                  only_coarse=False):
    return render_rays(params, spec, scene, inputs, edits, key,
                       only_coarse=only_coarse)


def render_rays_chunked(params, spec: LayeredSpec, scene: SceneBoxes,
                        inputs: RayInputs, edits: EditState | None = None,
                        *, chunk: int = 8192, key=None, mesh=None,
                        only_coarse: bool = False) -> RenderOutputs:
    """Render an arbitrary number of rays; returns host (numpy) outputs."""
    edits = edits if edits is not None else EditState.identity(spec.layer_num)
    n = int(inputs.rays_o.shape[0])
    if mesh is not None:
        d = mesh.shape[DATA_AXIS]
        chunk = ((chunk + d - 1) // d) * d
    n_pad = ((n + chunk - 1) // chunk) * chunk

    host = jax.tree.map(np.asarray, inputs)
    if n_pad != n:
        host = jax.tree.map(
            lambda x: np.concatenate([x, np.repeat(x[-1:], n_pad - n, axis=0)]), host)
    chunked = jax.tree.map(
        lambda x: x.reshape(n_pad // chunk, chunk, *x.shape[1:]), host)
    chunked = RayInputs(*chunked)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(None, DATA_AXIS))
        chunked = jax.tree.map(lambda x: jax.device_put(x, sharding), chunked)

    out = _render_frame(params, spec, scene, chunked, edits, key,
                        only_coarse=only_coarse)
    out = jax.device_get(out)

    lp1 = spec.layer_num + 1

    def fix(x):
        # (n_chunks, ...) -> flat rays; per-layer leaves keep (L+1) leading
        if x.ndim >= 3 and x.shape[1] == lp1:
            y = np.moveaxis(x, 1, 0).reshape(lp1, n_pad, *x.shape[3:])
            return y[:, :n]
        y = x.reshape(n_pad, *x.shape[2:])
        return y[:n]

    return jax.tree.map(fix, out)
