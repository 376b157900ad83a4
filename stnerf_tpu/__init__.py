"""stnerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for editable
free-viewpoint video via layered spatio-temporal neural radiance fields.

Re-implements the full capability surface of the PyTorch/CUDA reference
(DarlingHang/st-nerf, "Editable Free-viewpoint Video Using a Layered Neural
Representation", SIGGRAPH 2021) with a TPU-first architecture:

* the compute path is pure, jittable JAX (static shapes, `lax` control flow,
  fused Pallas kernels for the hot MLP evaluation),
* scaling is expressed with `jax.sharding.Mesh` + collective-inserting `jit`
  (data-parallel over rays; optional layer-parallel over performer fields),
* the host runtime (dataset ingestion, PLY parsing, ray pregeneration) has a
  native C++ core with a NumPy fallback.

Layer map (mirrors reference layout; see SURVEY.md §1):
  config/    yacs-compatible config tree        (ref: config/)
  ops/       sampling, encoding, compositing    (ref: layers/, utils/)
  models/    SpaceNet, MotionNet, layered field (ref: modeling/)
  kernels/   Pallas TPU kernels                 (no ref counterpart)
  parallel/  device mesh + shardings            (no ref counterpart)
  data/      datasets, caches, transforms      (ref: data/)
  engine/    trainer / evaluator               (ref: engine/)
  render/    path authoring + LayeredNeuralRenderer (ref: render/)
"""

__version__ = "0.1.0"
