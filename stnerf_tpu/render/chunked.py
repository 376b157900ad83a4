"""Chunked full-image rendering driver.

Replaces the reference's python chunk loop (ref: utils/batchify_rays.py:51-140)
with a single jit-compiled fixed-size chunk program: rays are padded to a
chunk multiple (static shapes -> one compilation), streamed through the
device, and stitched on host. With a multi-device mesh each chunk is sharded
across the ``data`` axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import EditState, RayInputs, RenderOutputs, SceneBoxes, render_rays
from ..models.layered import LayeredSpec
from ..parallel import batch_sharding


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
        # chunk must split evenly across the data axis
        d = mesh.shape["data"]
        chunk = ((chunk + d - 1) // d) * d
    n_pad = ((n + chunk - 1) // chunk) * chunk

    host = jax.tree.map(np.asarray, inputs)
    if n_pad != n:
        host = jax.tree.map(
            lambda x: np.concatenate([x, np.repeat(x[-1:], n_pad - n, axis=0)]), host)

    sharding = batch_sharding(mesh) if mesh is not None else None
    pieces = []
    for i in range(0, n_pad, chunk):
        part = jax.tree.map(lambda x: x[i:i + chunk], host)
        part = RayInputs(*part)
        if sharding is not None:
            part = jax.tree.map(lambda x: jax.device_put(x, sharding), part)
        sub = None
        if key is not None:
            key, sub = jax.random.split(key)
        out = _render_chunk(params, spec, scene, part, edits, sub,
                            only_coarse=only_coarse)
        pieces.append(jax.device_get(out))

    def cat(*xs):
        axis = 1 if xs[0].ndim >= 2 and xs[0].shape[0] == spec.layer_num + 1 else 0
        # per-layer leaves carry a leading (L+1) axis -> concat on rays axis 1
        return np.concatenate(xs, axis=axis)

    merged = jax.tree.map(cat, *pieces)

    def trim(x):
        if x.ndim >= 2 and x.shape[0] == spec.layer_num + 1:
            return x[:, :n]
        return x[:n]

    return jax.tree.map(trim, merged)
