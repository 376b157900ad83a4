"""Render/training coverage for the less-common model flags: pose
refinement, view deformation, NEAR_FAR sampling, SAME_SPACENET,
background space-time/deformation, deep rgb, and a single-performer scene."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stnerf_tpu.engine import make_optimizer, make_train_step
from stnerf_tpu.engine.trainer import TrainBatch
from stnerf_tpu.models import (EditState, LayeredSpec, init_layered_params,
                               render_rays)
from tests.test_layered import SPEC, make_rays, make_scene

render = jax.jit(render_rays, static_argnames=("spec", "only_coarse"))


def _cfg():
    from stnerf_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    return cfg


def _render_with(spec, n=8):
    params = init_layered_params(jax.random.PRNGKey(0), spec)
    inputs = make_rays(n)
    inputs = inputs._replace(
        frame_ids=inputs.frame_ids[:, :spec.layer_num + 1],
        cam_ids=jnp.arange(n, dtype=jnp.float32) % 3)
    scene = make_scene()
    if spec.layer_num != 2:
        scene = scene._replace(boxes=scene.boxes[:, :spec.layer_num])
    out = render(params, spec, scene, inputs, EditState.identity(spec.layer_num),
                 key=jax.random.PRNGKey(1))
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    return params, scene, inputs, out


class TestFlagCombos:
    def test_pose_refinement_renders_and_trains(self):
        spec = dataclasses.replace(SPEC, pose_refinement=True, camera_num=3)
        params, scene, inputs, _ = _render_with(spec)
        # tiny random-init nets can have all-negative density (dead field,
        # zero gradients everywhere); bias sigma positive so signal exists
        for k in ("layers_coarse", "layers_fine"):
            params[k]["density"][0]["b"] = params[k]["density"][0]["b"] + 1.0
        # identity-initialized refinement must not change the image
        base = render(params, dataclasses.replace(spec, pose_refinement=False),
                      scene, inputs, EditState.identity(2))
        refined = render(params, spec, scene, inputs, EditState.identity(2))
        np.testing.assert_allclose(np.asarray(refined.fine.color),
                                   np.asarray(base.fine.color), atol=1e-4)
        # camera parameters receive gradients (fixed vs reference, which
        # severs ray grads under BBOX sampling; layered_rfrender.py:270-315)
        def loss_fn(p):
            out = render_rays(p, spec, scene, inputs, EditState.identity(2))
            return (jnp.mean((out.fine.color - 0.4) ** 2)
                    + jnp.mean((out.coarse.color - 0.4) ** 2)) * 1e6
        g = jax.jit(jax.grad(loss_fn))(params)
        cam_grad = sum(float(jnp.abs(x).sum())
                       for x in jax.tree.leaves(g["cam_pose"]))
        assert np.isfinite(cam_grad) and cam_grad > 0

    def test_use_deform_view(self):
        spec = dataclasses.replace(SPEC, use_deform_view=True)
        _render_with(spec)

    def test_near_far_method(self):
        spec = dataclasses.replace(SPEC, sample_method="NEAR_FAR")
        _, _, _, out = _render_with(spec)
        # every ray samples the full near/far span: background contributes
        assert out.hit.all()

    def test_same_spacenet_shares_params(self):
        spec = dataclasses.replace(SPEC, same_spacenet=True)
        params = init_layered_params(jax.random.PRNGKey(0), spec)
        assert "layers_fine" not in params
        _render_with(spec)

    def test_bkgd_space_time_and_deform(self):
        spec = dataclasses.replace(SPEC, bkgd_use_space_time=True,
                                   bkgd_use_deform_time=True)
        params = init_layered_params(jax.random.PRNGKey(0), spec)
        assert "bkgd_motion" in params
        _render_with(spec)

    def test_deep_rgb(self):
        spec = dataclasses.replace(SPEC, deep_rgb=True)
        params = init_layered_params(jax.random.PRNGKey(0), spec)
        assert len(params["bkgd_coarse"]["rgb"]) == 4
        _render_with(spec)

    def test_single_layer_scene(self):
        spec = dataclasses.replace(SPEC, layer_num=1)
        _render_with(spec)

    def test_no_dir(self):
        spec = dataclasses.replace(SPEC, use_dir=False)
        _render_with(spec)
