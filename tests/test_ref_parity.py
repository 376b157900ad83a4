"""End-to-end numerical parity against the REFERENCE'S OWN implementation
(/root/reference, torch CPU) — not a rewritten mirror.

The mirror ships no pretrained checkpoints (.MISSING_LARGE_BLOBS), so the
checkpoint-parity north star (PSNR >= 40 dB, BASELINE.md) is proven with
same-weights A/B: our parameters are exported through the reference
state-dict layout, loaded into the reference's ``LayeredRFRender``
(ref: modeling/layered_rfrender.py:19-735), and both sides render the same
rays deterministically (tests/ref_harness pins the reference's torch.rand /
sample_pdf draws to our samplers' ``key=None`` modes).

Covered: plain render (coarse+fine mixed and per-layer), shift+scale edits,
hide-layer, and retiming with fractional per-layer frame ids.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference/modeling"):
    pytest.skip("reference implementation not present", allow_module_level=True)

import jax
import jax.numpy as jnp

from stnerf_tpu.config import get_cfg
from stnerf_tpu.models import (EditState, LayeredSpec, RayInputs, SceneBoxes,
                               compute_scale_pivot, init_layered_params,
                               render_rays)
from stnerf_tpu.models.rays import pack_rays
from tests.ref_harness import build_ref_model, psnr, run_ref_forward

TARGET_DB = 40.0  # BASELINE.md north star; measured agreement is ~70-90 dB

render = jax.jit(render_rays, static_argnames=("spec", "only_coarse"))


def _cfg():
    cfg = get_cfg()
    cfg.DATASETS.LAYER_NUM = 2
    cfg.MODEL.COARSE_RAY_SAMPLING = 16
    cfg.MODEL.FINE_RAY_SAMPLING = 8
    cfg.MODEL.SAMPLE_METHOD = "BBOX"
    cfg.MODEL.USE_SPACE_TIME = True
    cfg.MODEL.USE_DEFORM_TIME = True
    cfg.MODEL.DEEP_RGB = False
    cfg.MODEL.POSE_REFINEMENT = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_PALLAS = False
    cfg.TPU.TRAINABLE_KERNEL = False
    # golden parity compares the EXACT reference semantics — strip the
    # production inference approximations (default-on since round 5)
    cfg.TPU.FAST_FINE = False
    cfg.TPU.EARLY_EXIT_SEGMENTS = 0
    return cfg


def _scene(frames=3):
    boxes = np.zeros((frames, 2, 2, 3), np.float32)
    for f in range(frames):
        boxes[f, 0] = [[-1 + 0.1 * f, -1, 1], [1 + 0.1 * f, 1, 3]]
        boxes[f, 1] = [[-1, 1.5, 1], [1, 3.5, 3]]
    return SceneBoxes(jnp.array([[-6.0, -6.0, -6.0], [6.0, 6.0, 6.0]]),
                      jnp.array(boxes), jnp.array([0.5, 12.0]))


def _rays(n=48):
    o = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (n, 1))
    d = np.stack([np.linspace(-0.4, 0.4, n), np.linspace(-0.1, 0.5, n),
                  np.ones(n)], 1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return RayInputs(jnp.array(o), jnp.array(d), jnp.full((n, 3), 2.0),
                     jnp.zeros((n,)),
                     jnp.tile(jnp.array([[0.5, 12.0]], jnp.float32), (n, 1)))


@pytest.fixture(scope="module")
def ab():
    cfg = _cfg()
    spec = LayeredSpec.from_cfg(cfg)
    params = jax.device_get(init_layered_params(jax.random.PRNGKey(0), spec))
    scene = _scene()
    model = build_ref_model(cfg, params, spec, scene)
    return cfg, spec, params, scene, model


class TestReferenceParity:
    def test_plain_render(self, ab):
        cfg, spec, params, scene, model = ab
        inputs = _rays()
        ours = jax.device_get(render(params, spec, scene, inputs,
                                     EditState.identity(2), key=None))
        ref = run_ref_forward(model, pack_rays(inputs, spec))

        assert psnr(ref["fine"][0], ours.fine.color) > TARGET_DB
        assert psnr(ref["coarse"][0], ours.coarse.color) > TARGET_DB
        assert psnr(ref["coarse"][2], ours.coarse.acc) > TARGET_DB
        for i in range(3):
            assert psnr(ref["fine_layers"][i][2],
                        ours.fine_layers.acc[i]) > TARGET_DB, f"layer {i}"
        # hit masks agree exactly
        for i in range(3):
            np.testing.assert_array_equal(ref["ray_mask"][i].reshape(-1),
                                          np.asarray(ours.hit[i]))

    def test_shift_scale_edit(self, ab):
        cfg, spec, params, scene, model_plain = ab
        inputs = _rays()
        scale = [1.0, 0.75, 1.5]
        shift = [[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, -1.0, 0.0]]
        edits = EditState.identity(2)._replace(
            scale=jnp.array(scale, jnp.float32),
            shift=jnp.array(shift, jnp.float32),
            scale_pivot=compute_scale_pivot(scene.bkgd_box, scene.boxes[0]))
        ours = jax.device_get(render(params, spec, scene, inputs, edits,
                                     key=None))
        model = build_ref_model(cfg, params, spec, scene, scale=scale,
                                shift=shift)
        ref = run_ref_forward(model, pack_rays(inputs, spec))
        assert psnr(ref["fine"][0], ours.fine.color) > TARGET_DB
        assert psnr(ref["coarse"][0], ours.coarse.color) > TARGET_DB

    def test_hide_layer(self, ab):
        cfg, spec, params, scene, model = ab
        inputs = _rays()
        edits = EditState.identity(2)._replace(
            visible=jnp.array([1.0, 0.0, 1.0]))
        ours = jax.device_get(render(params, spec, scene, inputs, edits,
                                     key=None))
        model.hide_layer(1)
        try:
            ref = run_ref_forward(model, pack_rays(inputs, spec))
        finally:
            model.show_layer(1)
        assert psnr(ref["fine"][0], ours.fine.color) > TARGET_DB

    def test_retiming_fractional_frames(self, ab):
        cfg, spec, params, scene, model = ab
        inputs = _rays()
        n = inputs.rays_o.shape[0]
        fids = np.tile(np.array([[1.0, 1.5, 2.25]], np.float32), (n, 1))
        inputs = inputs._replace(frame_ids=jnp.asarray(fids))
        ours = jax.device_get(render(params, spec, scene, inputs,
                                     EditState.identity(2), key=None))
        ref = run_ref_forward(model, pack_rays(inputs, spec, retiming=True))
        assert psnr(ref["fine"][0], ours.fine.color) > TARGET_DB
        assert psnr(ref["coarse"][0], ours.coarse.color) > TARGET_DB
