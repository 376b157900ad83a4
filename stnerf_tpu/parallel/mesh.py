"""Device mesh and sharding policy.

The reference has no distributed execution at all (SURVEY.md §2.3): single
GPU, chunked python loops. Here scaling is first-class and TPU-shaped:

* mesh axis ``"data"`` — rays. Every ray is independent, so both training
  batches and render chunks shard along it; with replicated parameters the
  only collective jit inserts is the gradient ``psum`` over ICI (the
  TPU-native replacement for the DDP the reference never had).
* mesh axis ``"model"`` — optional layer-parallelism: the stacked performer
  fields' leading axis shards across it (an expert-parallel-like mode;
  useful only when L is large).

All sharding is expressed through ``NamedSharding`` constraints on jit
inputs/outputs; XLA inserts the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``model_parallel`` devices form the inner (fast-ICI) axis; the rest go to
    data. With the default 1 the mesh is effectively 1-D over rays.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ray_batch(mesh: Mesh, tree):
    """Place a pytree of per-ray arrays with the batch axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def shard_params(mesh: Mesh, params: dict) -> dict:
    """Replicate parameters; if the mesh has a >1 model axis, shard the
    stacked performer-field axis (leading dim of ``layers_*``/``motion``)
    across it."""
    mp = mesh.shape[MODEL_AXIS]
    out = {}
    for k, v in params.items():
        if mp > 1 and k in ("layers_coarse", "layers_fine", "motion"):
            s = NamedSharding(mesh, P(MODEL_AXIS))
            out[k] = jax.tree.map(lambda x: jax.device_put(x, s), v)
        else:
            out[k] = replicate(mesh, v)
    return out


def pad_for_mesh(n: int, mesh: Mesh, chunk: int = 1) -> int:
    """Smallest multiple of (data axis size * chunk) that is >= n."""
    q = mesh.shape[DATA_AXIS] * chunk
    return ((n + q - 1) // q) * q
