"""Pallas fused-SpaceNet kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stnerf_tpu.kernels import (fused_spacenet, fused_spacenet_stacked,
                                prepare_kernel_params)
from stnerf_tpu.models import SpaceNetSpec, apply_spacenet, init_spacenet
from stnerf_tpu.ops import positional_encoding


@pytest.mark.parametrize("deep,use_time", [(False, False), (True, True)])
def test_fused_matches_xla(rng, deep, use_time):
    spec = SpaceNetSpec(use_dir=True, use_time=use_time, deep_rgb=deep,
                        backbone_dim=32, head_dim=16)
    params = init_spacenet(jax.random.PRNGKey(0), spec)
    m = 300  # not a TILE multiple: exercises padding
    pos = rng.normal(size=(m, 3)).astype(np.float32)
    dirs = rng.normal(size=(m, 3)).astype(np.float32)
    times = rng.integers(1, 5, size=(m,)).astype(np.float32)

    rgb_ref, sig_ref = jax.jit(apply_spacenet, static_argnames=("spec",))(
        params, spec, jnp.array(pos), jnp.array(dirs),
        jnp.array(times) if use_time else None)

    kparams = prepare_kernel_params(jax.device_get(params), spec,
                                    dtype=jnp.float32)
    pos_enc = positional_encoding(jnp.array(pos), 10, True)
    dir_enc = positional_encoding(jnp.array(dirs), 4, True)
    time_enc = (positional_encoding(jnp.array(times)[:, None], 10, True)
                if use_time else None)
    rgb_k, sig_k = fused_spacenet(kparams, spec, pos_enc, dir_enc, time_enc,
                                  compute_dtype="float32", interpret=True)

    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_ref),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sig_k), np.asarray(sig_ref),
                               rtol=2e-3, atol=2e-4)


def test_fused_stacked_matches_per_layer(rng):
    spec = SpaceNetSpec(use_dir=True, use_time=True, deep_rgb=False,
                        backbone_dim=32, head_dim=16)
    L, m = 2, 128
    p0 = init_spacenet(jax.random.PRNGKey(1), spec)
    p1 = init_spacenet(jax.random.PRNGKey(2), spec)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p0, p1)

    pos = rng.normal(size=(L, m, 3)).astype(np.float32)
    dirs = rng.normal(size=(L, m, 3)).astype(np.float32)
    times = rng.integers(1, 4, size=(L, m)).astype(np.float32)

    kstacked = jax.vmap(lambda p: prepare_kernel_params(p, spec, jnp.float32)
                        )(stacked)
    rgb_s, sig_s = fused_spacenet_stacked(
        kstacked, spec,
        positional_encoding(jnp.array(pos), 10, True),
        positional_encoding(jnp.array(dirs), 4, True),
        positional_encoding(jnp.array(times)[..., None], 10, True),
        compute_dtype="float32", interpret=True)

    for l, p in enumerate((p0, p1)):
        rgb_ref, sig_ref = apply_spacenet(p, spec, jnp.array(pos[l]),
                                          jnp.array(dirs[l]), jnp.array(times[l]))
        np.testing.assert_allclose(np.asarray(rgb_s[l]), np.asarray(rgb_ref),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sig_s[l]), np.asarray(sig_ref),
                                   rtol=2e-3, atol=2e-4)


def test_planar_kernel_matches_xla(rng):
    from stnerf_tpu.kernels import fused_spacenet_planar, prepare_kernel_params_planar
    from stnerf_tpu.models.spacenet import apply_spacenet_planar
    from stnerf_tpu.ops.encoding import positional_encoding_planar as pep

    spec = SpaceNetSpec(use_dir=True, use_time=True, deep_rgb=False,
                        backbone_dim=32, head_dim=16)
    params = init_spacenet(jax.random.PRNGKey(5), spec)
    m = 260
    pos = rng.normal(size=(3, m)).astype(np.float32)
    dirs = rng.normal(size=(3, m)).astype(np.float32)
    times = rng.integers(1, 5, size=(m,)).astype(np.float32)

    rgb_ref, sig_ref = apply_spacenet_planar(params, spec, jnp.array(pos),
                                             jnp.array(dirs), jnp.array(times))
    kp = prepare_kernel_params_planar(jax.device_get(params), spec, jnp.float32)
    rgb_k, sig_k = fused_spacenet_planar(
        kp, spec, pep(jnp.array(pos), 10, True), pep(jnp.array(dirs), 4, True),
        pep(jnp.array(times)[None], 10, True),
        compute_dtype="float32", interpret=True, tile=128)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_ref),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sig_k), np.asarray(sig_ref),
                               rtol=2e-3, atol=2e-4)


def test_planar_matches_rowmajor(rng):
    from stnerf_tpu.models.spacenet import apply_spacenet_planar

    spec = SpaceNetSpec(use_dir=True, use_time=True, deep_rgb=True,
                        backbone_dim=32, head_dim=16)
    params = init_spacenet(jax.random.PRNGKey(7), spec)
    m = 64
    pos = rng.normal(size=(m, 3)).astype(np.float32)
    dirs = rng.normal(size=(m, 3)).astype(np.float32)
    times = rng.integers(1, 5, size=(m,)).astype(np.float32)
    rgb_r, sig_r = apply_spacenet(params, spec, jnp.array(pos), jnp.array(dirs),
                                  jnp.array(times))
    rgb_p, sig_p = apply_spacenet_planar(params, spec, jnp.array(pos.T),
                                         jnp.array(dirs.T), jnp.array(times))
    np.testing.assert_allclose(np.asarray(rgb_p.T), np.asarray(rgb_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_p), np.asarray(sig_r), atol=1e-5)


class TestFusedField:
    @pytest.mark.parametrize("motion_mode", [None, "direct", "lerp"])
    def test_matches_staged_path(self, rng, motion_mode):
        from stnerf_tpu.kernels.fused_field import (fused_field,
                                                    prepare_motion_params_planar)
        from stnerf_tpu.kernels import prepare_kernel_params_planar
        from stnerf_tpu.models import MotionNetSpec, init_motionnet
        from stnerf_tpu.models.motionnet import apply_motionnet_planar
        from stnerf_tpu.models.spacenet import apply_spacenet_planar
        from stnerf_tpu.ops.encoding import positional_encoding_planar as pep

        spec = SpaceNetSpec(use_dir=True, use_time=True, deep_rgb=False,
                            backbone_dim=32, head_dim=16)
        sp = init_spacenet(jax.random.PRNGKey(0), spec)
        mspec = MotionNetSpec(width=32, input_time=(motion_mode == "lerp"))
        mp = init_motionnet(jax.random.PRNGKey(1), mspec)

        m = 200
        xyz = rng.normal(size=(3, m)).astype(np.float32)
        ids = (rng.integers(1, 4, size=(m,)).astype(np.float32)
               + (0.5 if motion_mode == "lerp" else 0.0))

        # staged reference: motion displacement then spacenet
        x_ref = jnp.array(xyz)
        if motion_mode:
            x_ref = x_ref + apply_motionnet_planar(mp, mspec, x_ref, jnp.array(ids))
        dirs = rng.normal(size=(3, m)).astype(np.float32)
        rgb_ref, sig_ref = apply_spacenet_planar(sp, spec, x_ref,
                                                 jnp.array(dirs), jnp.array(ids))

        rgb_k, sig_k = fused_field(
            prepare_kernel_params_planar(jax.device_get(sp), spec, jnp.float32),
            prepare_motion_params_planar(jax.device_get(mp), jnp.float32)
            if motion_mode else (),
            spec, jnp.array(xyz), jnp.array(ids)[None], pep(jnp.array(dirs), 4, True),
            motion_mode=motion_mode, compute_dtype="float32",
            interpret=True, tile=128)
        np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_ref),
                                   rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(sig_k), np.asarray(sig_ref),
                                   rtol=5e-3, atol=5e-4)


class TestTrainableSpaceNet:
    """Hand-differentiated fused SpaceNet (kernels.spacenet_vjp) vs jax.grad
    of the XLA path, on pre-encoded planar inputs (interpret mode)."""

    @staticmethod
    def _ref_preencoded(params, spec, pos_enc, dir_enc, time_enc):
        from stnerf_tpu.models.mlp import linear_planar, mlp_planar
        x = mlp_planar(params["stage1"], pos_enc, None, final_activation=True)
        x = mlp_planar(params["stage2"], jnp.concatenate([x, pos_enc], 0),
                       None, final_activation=True)
        sigma = linear_planar(params["density"][0], x, None)[0]
        feats = [x]
        if spec.use_dir:
            feats.append(dir_enc)
        if spec.use_time:
            feats.append(time_enc)
        h = jax.nn.relu(jnp.concatenate(feats, 0))
        rgb = mlp_planar(params["rgb"], h, None)
        return rgb, sigma

    @pytest.mark.parametrize("deep,use_dir,use_time", [
        (False, True, True), (True, True, False), (False, False, False)])
    def test_value_and_grads_match_xla(self, rng, deep, use_dir, use_time):
        from stnerf_tpu.kernels.spacenet_vjp import spacenet_planar_trainable
        from stnerf_tpu.ops.encoding import positional_encoding_planar as pep

        spec = SpaceNetSpec(use_dir=use_dir, use_time=use_time, deep_rgb=deep,
                            backbone_dim=32, head_dim=16)
        params = init_spacenet(jax.random.PRNGKey(3), spec)
        m = 200  # not a tile multiple: exercises zero-padded columns
        pos_enc = pep(jnp.array(rng.normal(size=(3, m)).astype(np.float32)),
                      spec.pos_freqs, True)
        dir_enc = (pep(jnp.array(rng.normal(size=(3, m)).astype(np.float32)),
                       spec.dir_freqs, True) if use_dir
                   else jnp.zeros((1, m), jnp.float32))
        time_enc = (pep(jnp.array(rng.integers(1, 5, size=(1, m))
                                  .astype(np.float32)), spec.time_freqs, True)
                    if use_time else None)
        c_rgb = jnp.array(rng.normal(size=(3, m)).astype(np.float32))
        c_sig = jnp.array(rng.normal(size=(m,)).astype(np.float32))

        def loss_ref(p, pe_, de_):
            rgb, sig = self._ref_preencoded(p, spec, pe_, de_, time_enc)
            return jnp.sum(rgb * c_rgb) + jnp.sum(sig * c_sig)

        def loss_k(p, pe_, de_):
            rgb, sig = spacenet_planar_trainable(p, spec, pe_, de_,
                                                 time_enc, "float32", True, 128)
            return jnp.sum(rgb * c_rgb) + jnp.sum(sig * c_sig)

        v_ref, (gp_ref, gx_ref, gd_ref) = jax.value_and_grad(
            loss_ref, (0, 1, 2))(params, pos_enc, dir_enc)
        v_k, (gp_k, gx_k, gd_k) = jax.value_and_grad(
            loss_k, (0, 1, 2))(params, pos_enc, dir_enc)

        np.testing.assert_allclose(float(v_k), float(v_ref), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_ref),
                                   rtol=2e-3, atol=2e-4)
        # direction-encoding gradient (the POSE_REFINEMENT training signal)
        np.testing.assert_allclose(np.asarray(gd_k), np.asarray(gd_ref),
                                   rtol=2e-3, atol=2e-4)
        flat_r, tdef = jax.tree.flatten(gp_ref)
        flat_k = jax.tree.leaves(gp_k)
        assert tdef == jax.tree.structure(gp_k)
        for a, b in zip(flat_k, flat_r):
            scale = max(1e-3, float(jnp.max(jnp.abs(b))))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3 * scale)


class TestFieldVjp:
    """Fully-fused trainable field (kernels.field_vjp) vs jax.grad of the
    staged XLA composition motion -> encode -> SpaceNet (interpret mode)."""

    @pytest.mark.parametrize("mode,use_time", [
        (None, False), ("direct", False), ("lerp", True)])
    def test_value_and_grads_match_xla(self, rng, mode, use_time):
        from stnerf_tpu.kernels.field_vjp import field_planar_trainable
        from stnerf_tpu.models.motionnet import (MotionNetSpec,
                                                 apply_motionnet_planar,
                                                 init_motionnet)
        from stnerf_tpu.ops.encoding import positional_encoding_planar as pep

        sspec = SpaceNetSpec(use_dir=True, use_time=use_time, deep_rgb=False,
                             backbone_dim=32, head_dim=16)
        sparams = init_spacenet(jax.random.PRNGKey(3), sspec)
        mspec = MotionNetSpec(width=16, input_time=(mode == "lerp"))
        mparams = init_motionnet(jax.random.PRNGKey(4), mspec) if mode else None

        m = 200  # not a tile multiple: exercises zero-padded columns
        xyz = jnp.array(rng.normal(size=(3, m)).astype(np.float32))
        frac = 0.3 if mode == "lerp" else 0.0  # fractional retiming ids
        ids = jnp.array((rng.integers(1, 4, size=(1, m)) + frac)
                        .astype(np.float32))
        dir_enc = pep(jnp.array(rng.normal(size=(3, m)).astype(np.float32)),
                      sspec.dir_freqs, True)
        c_rgb = jnp.array(rng.normal(size=(3, m)).astype(np.float32))
        c_sig = jnp.array(rng.normal(size=(m,)).astype(np.float32))

        def loss_ref(sp, mp, x, de):
            xx = x
            if mode:
                flow = apply_motionnet_planar(mp, mspec, x, ids[0], None,
                                              recursive_enc=True)
                xx = x + flow
            pos = pep(xx, sspec.pos_freqs, True, recursive=True)
            te = (pep(ids, sspec.time_freqs, True, recursive=True)
                  if use_time else None)
            rgb, sig = TestTrainableSpaceNet._ref_preencoded(
                sp, sspec, pos, de, te)
            return jnp.sum(rgb * c_rgb) + jnp.sum(sig * c_sig)

        def loss_k(sp, mp, x, de):
            rgb, sig = field_planar_trainable(sp, mp, x, ids, de, None,
                                              sspec, mode, "float32", True,
                                              128)
            return jnp.sum(rgb * c_rgb) + jnp.sum(sig * c_sig)

        argnums = (0, 1, 2, 3) if mode else (0, 2, 3)
        v_ref, g_ref = jax.value_and_grad(loss_ref, argnums)(
            sparams, mparams, xyz, dir_enc)
        v_k, g_k = jax.value_and_grad(loss_k, argnums)(
            sparams, mparams, xyz, dir_enc)

        np.testing.assert_allclose(float(v_k), float(v_ref), rtol=2e-4)
        flat_r, tdef = jax.tree.flatten(g_ref)
        flat_k = jax.tree.leaves(g_k)
        assert tdef == jax.tree.structure(g_k)
        for a, b in zip(flat_k, flat_r):
            scale = max(1e-3, float(jnp.max(jnp.abs(b))))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3 * scale)


class TestTileSkipFlags:
    def test_flags_skip_matches_masked_full_run(self):
        """Per-tile skip flags: a 0 tile must produce zero outputs and
        contribute zero gradients; with cotangents zeroed on skipped samples
        (exactly what the downstream hit-mask induces), values and ALL
        gradients must equal the unflagged kernel."""
        import numpy as np

        from stnerf_tpu.kernels.field_vjp import field_planar_trainable
        from stnerf_tpu.models.spacenet import SpaceNetSpec, init_spacenet
        from stnerf_tpu.models.motionnet import MotionNetSpec, init_motionnet
        from stnerf_tpu.ops.encoding import positional_encoding_planar as pep

        rng = np.random.default_rng(5)
        m, tile = 256, 128
        sspec = SpaceNetSpec(use_dir=True, use_time=True, deep_rgb=False,
                             include_input=True, backbone_dim=32, head_dim=16)
        mspec = MotionNetSpec(c_input=4, include_input=True, width=16,
                              input_time=True)
        sparams = init_spacenet(jax.random.PRNGKey(0), sspec)
        mparams = init_motionnet(jax.random.PRNGKey(1), mspec)
        xyz = jnp.array(rng.normal(size=(3, m)).astype(np.float32))
        ids = jnp.array(rng.integers(1, 3, size=(1, m)).astype(np.float32))
        dir_enc = pep(jnp.array(rng.normal(size=(3, m)).astype(np.float32)),
                      sspec.dir_freqs, True)
        # cotangents zero on the second (skipped) tile
        mask = np.zeros((m,), np.float32)
        mask[:tile] = 1.0
        c_rgb = jnp.array(rng.normal(size=(3, m)).astype(np.float32) * mask)
        c_sig = jnp.array(rng.normal(size=(m,)).astype(np.float32) * mask)
        flags = jnp.array([1, 0], jnp.int32)

        def loss(sp, mp, x, de, fl):
            rgb, sig = field_planar_trainable(sp, mp, x, ids, de, fl,
                                              sspec, "lerp", "float32",
                                              True, tile)
            return jnp.sum(rgb * c_rgb) + jnp.sum(sig * c_sig), (rgb, sig)

        (v_f, (rgb_f, sig_f)), g_f = jax.value_and_grad(
            loss, (0, 1, 2, 3), has_aux=True)(sparams, mparams, xyz,
                                              dir_enc, flags)
        (v_n, (rgb_n, sig_n)), g_n = jax.value_and_grad(
            loss, (0, 1, 2, 3), has_aux=True)(sparams, mparams, xyz,
                                              dir_enc, None)

        # skipped tile outputs are exact zeros; kept tile matches
        np.testing.assert_array_equal(np.asarray(rgb_f[:, tile:]), 0.0)
        np.testing.assert_array_equal(np.asarray(sig_f[tile:]), 0.0)
        np.testing.assert_allclose(np.asarray(rgb_f[:, :tile]),
                                   np.asarray(rgb_n[:, :tile]), rtol=1e-6)
        np.testing.assert_allclose(float(v_f), float(v_n), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_n)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestPoseRefinementTrainableKernel:
    def test_pose_grads_match_xla_path(self, monkeypatch):
        """POSE_REFINEMENT trains on the fused trainable kernel: the kernel's
        direction-encoding gradient must drive the same cam_pose gradients as
        the pure-XLA path (kernel in interpret mode on CPU)."""
        from stnerf_tpu.kernels import spacenet_vjp
        from stnerf_tpu.models import (EditState, LayeredSpec, RayInputs,
                                       SceneBoxes, init_layered_params,
                                       render_rays)
        from stnerf_tpu.models import layered as layered_mod

        spec = LayeredSpec(layer_num=1, coarse_samples=6, fine_samples=3,
                           sample_method="BBOX", use_space_time=True,
                           use_deform_time=True, pose_refinement=True,
                           camera_num=2, backbone_dim=16, head_dim=8,
                           motion_dim=8, compute_dtype="float32")
        params = init_layered_params(jax.random.PRNGKey(0), spec)
        # non-identity camera correction so dir grads are exercised off-axis
        params["cam_pose"]["rvec"] = params["cam_pose"]["rvec"] + jnp.array(
            [[0.0, 0.02, -0.01, 0.015], [0.0, -0.01, 0.02, 0.0]])
        scene = SceneBoxes(
            bkgd_box=jnp.array([[-6.0, -6.0, -6.0], [6.0, 6.0, 6.0]]),
            boxes=jnp.tile(jnp.array([[[-1.0, -1, 1], [1, 1, 3]]])[None],
                           (3, 1, 1, 1)),
            bkgd_near_far=jnp.array([0.5, 12.0]))
        n = 8
        d = np.stack([np.linspace(-0.3, 0.3, n), np.zeros(n), np.ones(n)],
                     axis=1).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        inputs = RayInputs(
            jnp.tile(jnp.array([[0.0, 0.0, -5.0]], jnp.float32), (n, 1)),
            jnp.asarray(d), jnp.ones((n, 2), jnp.float32),
            jnp.asarray((np.arange(n) % 2).astype(np.float32)),
            jnp.tile(jnp.array([[0.5, 12.0]], jnp.float32), (n, 1)))
        key = jax.random.PRNGKey(3)

        def loss(p):
            out = render_rays(p, spec, scene, inputs, EditState.identity(1),
                              key=key)
            return jnp.sum(out.fine.color ** 2) + jnp.sum(out.coarse.color ** 2)

        g_xla = jax.grad(loss)(params)

        orig = spacenet_vjp.spacenet_planar_trainable
        monkeypatch.setattr(
            spacenet_vjp, "spacenet_planar_trainable",
            lambda p, s, pe_, de_, te, cd="bfloat16", interpret=False,
                   tile=1024: orig(p, s, pe_, de_, te, cd, True, 128))
        monkeypatch.setattr(layered_mod, "_use_trainable_kernel",
                            lambda s: True)
        g_k = jax.grad(loss)(params)

        for (path_r, a), (path_k, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_xla),
                jax.tree_util.tree_leaves_with_path(g_k)):
            assert path_r == path_k
            scale = max(1e-3, float(jnp.max(jnp.abs(a))))
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=3e-3, atol=3e-3 * scale,
                err_msg=f"grad mismatch at {path_r}")
        # the pose parameters specifically must receive nonzero gradient
        assert float(jnp.max(jnp.abs(g_k["cam_pose"]["rvec"]))) > 0
        assert float(jnp.max(jnp.abs(g_k["cam_pose"]["tvec"]))) > 0


class TestFusedNoDir:
    def test_eval_fields_fused_traces_without_dir(self):
        """USE_DIR=False on the fused inference path: prepare_kernel_params
        emits a (1, W) dummy r1b, so the field eval must feed a matching
        (1, M) zero dir operand or the kernel's contraction dims mismatch
        at trace time."""
        import dataclasses

        from stnerf_tpu.models import init_layered_params
        from stnerf_tpu.models.layered import _eval_fields_fused
        from tests.test_layered import SPEC

        spec = dataclasses.replace(SPEC, use_dir=False)
        params = init_layered_params(jax.random.PRNGKey(0), spec)
        lp1, N, S = spec.layer_num + 1, 4, 8
        xyz = jnp.zeros((lp1, 3, N, S), jnp.float32)
        dirs = jnp.zeros((3, N), jnp.float32)
        fids = jnp.ones((N, lp1), jnp.float32)
        out = jax.eval_shape(
            lambda p: _eval_fields_fused(p, spec, xyz, dirs, fids, fine=False),
            params)
        assert out[0].shape == (lp1, 3, N, S)
        assert out[1].shape == (lp1, N, S)
