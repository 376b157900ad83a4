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

        def loss_ref(p, pe_):
            rgb, sig = self._ref_preencoded(p, spec, pe_, dir_enc, time_enc)
            return jnp.sum(rgb * c_rgb) + jnp.sum(sig * c_sig)

        def loss_k(p, pe_):
            rgb, sig = spacenet_planar_trainable(p, spec, pe_, dir_enc,
                                                 time_enc, "float32", True, 128)
            return jnp.sum(rgb * c_rgb) + jnp.sum(sig * c_sig)

        v_ref, (gp_ref, gx_ref) = jax.value_and_grad(loss_ref, (0, 1))(
            params, pos_enc)
        v_k, (gp_k, gx_k) = jax.value_and_grad(loss_k, (0, 1))(params, pos_enc)

        np.testing.assert_allclose(float(v_k), float(v_ref), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_ref),
                                   rtol=2e-3, atol=2e-4)
        flat_r, tdef = jax.tree.flatten(gp_ref)
        flat_k = jax.tree.leaves(gp_k)
        assert tdef == jax.tree.structure(gp_k)
        for a, b in zip(flat_k, flat_r):
            scale = max(1e-3, float(jnp.max(jnp.abs(b))))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3 * scale)


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
