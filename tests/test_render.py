"""Renderer-layer tests: path authoring, retiming remap, the mesh
rasterizer, the legacy per-frame renderer, video writing, and
pose-level-device vs chunked-render parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stnerf_tpu.data import lookat
from stnerf_tpu.models import EditState, init_layered_params
from stnerf_tpu.render.paths import retime_frames, smooth_pose_path
from tests.test_layered import SPEC, make_scene


class TestPaths:
    def test_smooth_pose_path_endpoints(self, rng):
        poses = np.stack([lookat(np.array([3.0, 0, 0]), np.zeros(3), np.array([0, 1.0, 0])),
                          lookat(np.array([0, 0, 3.0]), np.zeros(3), np.array([0, 1.0, 0])),
                          lookat(np.array([-3.0, 0, 0]), np.zeros(3), np.array([0, 1.0, 0]))])
        Ks = np.stack([np.eye(3, dtype=np.float32) * (1 + i) for i in range(3)])
        out_p, out_k = smooth_pose_path(poses, Ks, 7, around=True)
        assert out_p.shape == (7, 4, 4) and out_k.shape == (7, 3, 3)
        np.testing.assert_allclose(out_p[0, :3, :3], poses[0, :3, :3], atol=1e-4)
        np.testing.assert_allclose(out_p[-1, :3, :3], poses[-1, :3, :3], atol=1e-4)
        # rotations stay orthonormal along the path
        for R in out_p[:, :3, :3]:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        np.testing.assert_allclose(out_k[0], Ks[0], atol=1e-5)
        np.testing.assert_allclose(out_k[-1], Ks[-1], atol=1e-5)

    def test_retime_frames_anchors(self):
        # layer timeline anchors [21,49], output anchors [20,50]
        # (taekwondo-style remap, ref: layered_neural_renderer.py:495-544)
        out = retime_frames([20, 50], [21, 49], [20, 50], 1, 101)
        assert out == [21, 49]
        # midpoint between anchors interpolates linearly
        mid = retime_frames([35], [21, 49], [20, 50], 1, 101)[0]
        assert mid == round(21 + (35 - 20) / 30 * 28)
        # beyond the last anchor interpolates to max_frame
        tail = retime_frames([101], [21, 49], [20, 50], 1, 101)[0]
        assert tail == 101


class TestRasterizer:
    def _quad(self):
        from stnerf_tpu.render.bkgd_renderer import Mesh

        verts = np.array([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]], np.float32)
        uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        tex = np.zeros((8, 8, 3), np.uint8)
        tex[:, :4] = [255, 0, 0]
        tex[:, 4:] = [0, 0, 255]
        return Mesh(verts, uvs, faces, tex)

    @pytest.mark.parametrize("native", [True, False])
    def test_quad_render(self, native):
        from stnerf_tpu.data import native as native_mod
        from stnerf_tpu.render.bkgd_renderer import MeshRender, _rasterize_numpy

        mesh = self._quad()
        K = np.array([[40.0, 0, 32], [0, 40, 32], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        if native:
            if not native_mod.available():
                pytest.skip("native lib not built")
            rgb, depth = MeshRender(mesh).render(K, c2w, 64, 64)
        else:
            rgb, depth = _rasterize_numpy(mesh, K, c2w, 64, 64)
        # center hits the quad at depth 2
        assert abs(depth[32, 32] - 2.0) < 1e-3
        # left half red-ish, right half blue-ish
        assert rgb[32, 20, 0] > 200 and rgb[32, 20, 2] < 50
        assert rgb[32, 44, 2] > 200 and rgb[32, 44, 0] < 50
        # corners (outside quad projection) empty
        assert depth[0, 0] == 0.0

    def test_native_matches_numpy(self):
        from stnerf_tpu.data import native as native_mod
        from stnerf_tpu.render.bkgd_renderer import MeshRender, _rasterize_numpy

        if not native_mod.available():
            pytest.skip("native lib not built")
        mesh = self._quad()
        K = np.array([[40.0, 0, 32], [0, 40, 32], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        rgb_n, d_n = MeshRender(mesh).render(K, c2w, 64, 64)
        rgb_p, d_p = _rasterize_numpy(mesh, K, c2w, 64, 64)
        # triangle-boundary pixels may round differently between the two
        both = (d_n > 0) & (d_p > 0)
        assert ((d_n > 0) == (d_p > 0)).mean() > 0.99
        np.testing.assert_allclose(d_n[both], d_p[both], atol=1e-3)
        assert (rgb_n[both] == rgb_p[both]).mean() > 0.999


class TestPoseDeviceParity:
    def test_matches_chunked(self):
        from stnerf_tpu.render.chunked import render_rays_chunked
        from stnerf_tpu.render.pose_device import render_pose_host
        from stnerf_tpu.data.cameras import pixel_rays
        from stnerf_tpu.models import RayInputs

        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        scene = make_scene()
        h = w = 16
        K = np.array([[12.0, 0, 8], [0, 12, 8], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0, 0, -5]
        frame_ids = np.array([1.0, 2.0, 1.0], np.float32)

        color, depth, c_layers, d_layers = render_pose_host(
            params, SPEC, scene, K, c2w, frame_ids, np.array([0.5, 12.0]),
            EditState.identity(2), h, w, chunk=64, far_clip=20.0)

        rays = pixel_rays(K, c2w, h, w)
        n = rays.shape[0]
        inputs = RayInputs(rays[:, :3], rays[:, 3:6],
                           np.tile(frame_ids[None], (n, 1)),
                           np.zeros(n, np.float32),
                           np.tile([[0.5, 12.0]], (n, 1)).astype(np.float32))
        ref = render_rays_chunked(params, SPEC, scene, inputs, chunk=64)
        ref_color = np.clip(np.asarray(ref.fine.color).reshape(h, w, 3), 0, 1)
        # u8 quantization allows 1/255 slack (+ f32 vs f16 depth)
        np.testing.assert_allclose(color, ref_color, atol=2.5 / 255)
        ref_depth = np.clip(np.asarray(ref.fine.depth).reshape(h, w, 1), 0, None) / 20.0
        np.testing.assert_allclose(depth, ref_depth, atol=2e-3)

    def test_download_layers_trims_and_matches(self):
        """download_layers=[0, 2]: selected layers match the full download
        bit-exactly, skipped layers come back as zero images, and the
        mixed color/depth are untouched; timings dict gets the split."""
        from stnerf_tpu.render.pose_device import render_pose_host

        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        scene = make_scene()
        h = w = 16
        K = np.array([[12.0, 0, 8], [0, 12, 8], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0, 0, -5]
        frame_ids = np.array([1.0, 2.0, 1.0], np.float32)
        args = (params, SPEC, scene, K, c2w, frame_ids,
                np.array([0.5, 12.0]), EditState.identity(2), h, w)

        color_f, depth_f, cl_f, dl_f = render_pose_host(
            *args, chunk=64, far_clip=20.0)
        timings = {}
        color_t, depth_t, cl_t, dl_t = render_pose_host(
            *args, chunk=64, far_clip=20.0, timings=timings,
            download_layers=[0, 2])

        np.testing.assert_array_equal(color_t, color_f)
        np.testing.assert_array_equal(depth_t, depth_f)
        for i in (0, 2):
            np.testing.assert_array_equal(cl_t[i], cl_f[i])
            np.testing.assert_array_equal(dl_t[i], dl_f[i])
        assert not cl_t[1].any() and not dl_t[1].any()
        assert cl_t[1].shape == (h, w, 3) and dl_t[1].shape == (h, w, 1)
        assert timings["device_s"] > 0 and timings["download_s"] > 0


class TestNeuralRenderer:
    def test_single_field_and_mix(self):
        from stnerf_tpu.models.layered import LayeredSpec
        from stnerf_tpu.render.neural_renderer import FieldEntry, NeuralRenderer

        spec0 = LayeredSpec(layer_num=0, coarse_samples=8, fine_samples=4,
                            backbone_dim=16, head_dim=8,
                            compute_dtype="float32")
        params = init_layered_params(jax.random.PRNGKey(1), spec0)
        entry = FieldEntry(params=params, spec=spec0,
                           bbox=np.array([[-2.0, -2, 1], [2, 2, 5]], np.float32),
                           near_far=np.array([0.5, 8.0], np.float32))
        nr = NeuralRenderer()
        nr.add_model(0, 1, entry)
        K = np.array([[12.0, 0, 8], [0, 12, 8], [0, 0, 1]], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0, 0, -3]
        color, depth = nr.render_frame_layer(0, 1, pose, K, 16, 16, chunk=64)
        assert color.shape == (16, 16, 3) and depth.shape == (16, 16)

        mixed, zbuf = NeuralRenderer.mix_image(
            [np.zeros((4, 4, 3)), np.ones((4, 4, 3))],
            [np.full((4, 4), 2.0), np.full((4, 4), 1.0)])
        np.testing.assert_allclose(mixed, 1.0)  # nearer layer wins
        np.testing.assert_allclose(zbuf, 1.0)


@pytest.mark.isolate   # two renderer instantiations x (fast+exact) gate
# probes: keeps the main process under the XLA program-count crash line
class TestFidelityGate:
    """TPU.FIDELITY_GATE: the production fast path (FAST_FINE +
    EARLY_EXIT_SEGMENTS, config defaults since round 5) must prove itself
    against the exact reference-semantics path at checkpoint load, and fall
    back to exact below TPU.FIDELITY_MIN_DB."""

    @pytest.fixture(scope="class")
    def scene_dirs(self, tmp_path_factory):
        from stnerf_tpu.data.synthetic import make_synthetic_scene

        root = str(tmp_path_factory.mktemp("fid_scene"))
        make_synthetic_scene(root, width=60, height=45, num_cams=3,
                             num_frames=2)
        return root, str(tmp_path_factory.mktemp("fid_out"))

    def _cfg(self, root, out):
        from stnerf_tpu.data.synthetic import synthetic_cfg

        cfg = synthetic_cfg(root, 60, 45, 2)
        cfg.OUTPUT_DIR = out
        cfg.TPU.USE_PALLAS = False
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.MODEL.COARSE_RAY_SAMPLING = 12
        cfg.MODEL.FINE_RAY_SAMPLING = 6
        cfg.TPU.FIDELITY_PROBE_RES = 32
        cfg.TPU.OCC_GRID = 8        # occupancy is default-on since round 5;
        return cfg                  # keep its lattice small for CPU tests

    def test_pass_fallback_and_no_ckpt(self, scene_dirs):
        from stnerf_tpu.engine.checkpoint import save_checkpoint
        from stnerf_tpu.render.renderer import LayeredNeuralRenderer

        root, out = scene_dirs
        # no checkpoint yet: gate must be skipped (nothing to probe), fast
        # flags stay as configured
        cfg0 = self._cfg(root, out)
        assert cfg0.TPU.FAST_FINE and cfg0.TPU.EARLY_EXIT_SEGMENTS == 3
        cfg0.freeze()
        r0 = LayeredNeuralRenderer(cfg0)
        assert r0.fidelity_db is None
        assert r0.spec.fast_fine and r0.spec.coarse_exit_segments == 3

        save_checkpoint(out, r0.params, None, 1)

        # permissive bar: gate runs, records fidelity_db, keeps the fast path
        cfg1 = self._cfg(root, out)
        cfg1.TPU.FIDELITY_MIN_DB = 0.0
        cfg1.freeze()
        r1 = LayeredNeuralRenderer(cfg1)
        assert r1.fidelity_db is not None and np.isfinite(r1.fidelity_db)
        assert r1.spec.fast_fine and r1.spec.coarse_exit_segments == 3
        # occupancy (default-on, auto-tau) engaged alongside the gated fast
        # path: the probe measures fast/exit on the PRE-occupancy boxes
        # (auto-tau carries its own analytic bound), occ boxes stay active
        assert r1.scene is not r1._exact_scene

        # impossible bar: gate trips -> exact reference semantics + original
        # boxes for the whole session
        cfg2 = self._cfg(root, out)
        cfg2.TPU.FIDELITY_MIN_DB = 1e9
        cfg2.freeze()
        r2 = LayeredNeuralRenderer(cfg2)
        assert r2.fidelity_db is not None
        assert not r2.spec.fast_fine and r2.spec.coarse_exit_segments == 0
        assert r2.scene is r2._exact_scene
        # same weights, same probe -> same measured fidelity
        np.testing.assert_allclose(r2.fidelity_db, r1.fidelity_db, rtol=1e-5)


class TestFidelityGateStagedFallback:
    """Manual-tau occupancy inside the probe must not drag the whole fast
    stack down with it: when the occ-inclusive probe fails but the fast
    flags alone pass, only the occupancy boxes are dropped."""

    def test_staged_fallback_drops_occupancy_only(self, tmp_path_factory,
                                                  monkeypatch):
        import dataclasses

        import jax.numpy as jnp

        from stnerf_tpu.data.synthetic import (make_synthetic_scene,
                                               synthetic_cfg)
        from stnerf_tpu.engine.checkpoint import save_checkpoint
        from stnerf_tpu.models import init_layered_params
        from stnerf_tpu.models.layered import LayeredSpec
        from stnerf_tpu.render import occupancy, pose_device
        from stnerf_tpu.render.renderer import LayeredNeuralRenderer

        root = str(tmp_path_factory.mktemp("sf_scene"))
        out = str(tmp_path_factory.mktemp("sf_out"))
        make_synthetic_scene(root, width=60, height=45, num_cams=3,
                             num_frames=2)
        cfg = synthetic_cfg(root, 60, 45, 2)
        cfg.OUTPUT_DIR = out
        cfg.TPU.USE_PALLAS = False
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.MODEL.COARSE_RAY_SAMPLING = 8
        cfg.MODEL.FINE_RAY_SAMPLING = 4
        cfg.TPU.FIDELITY_PROBE_RES = 16
        cfg.TPU.OCC_AUTO_TAU = False      # manual tau: occ enters the probe
        cfg.TPU.FIDELITY_MIN_DB = 30.0
        cfg.freeze()
        spec = LayeredSpec.from_cfg(cfg)
        save_checkpoint(out, init_layered_params(jax.random.PRNGKey(0), spec),
                        None, 1)

        # deterministic refine: shrink every live box a little so the occ
        # scene is a distinct object with different boxes
        def fake_refine(params, spec_, scene, **kw):
            b = jnp.asarray(scene.boxes)
            c = b.mean(axis=-2, keepdims=True)
            return scene._replace(boxes=c + (b - c) * 0.8)

        monkeypatch.setattr(occupancy, "refined_boxes_cached", fake_refine)

        class _Frame:
            def __init__(self, v):
                self.color = jnp.full((256, 3), v, jnp.uint8)
                self.depth = jnp.zeros((256, 1), jnp.float32)

        orig_boxes = None

        def fake_render(params, s, scene, *a, **kw):
            same = bool(jnp.all(jnp.asarray(scene.boxes) == orig_boxes))
            if not s.fast_fine:
                return _Frame(100)        # exact reference render
            if not same:
                return _Frame(160)        # fast + occ boxes: way off
            return _Frame(101)            # fast on original boxes: close

        monkeypatch.setattr(pose_device, "render_pose_on_device", fake_render)
        from stnerf_tpu.data import RenderScene
        orig_boxes = jnp.asarray(RenderScene(cfg).scene_boxes.boxes)

        r = LayeredNeuralRenderer(cfg)
        # staged fallback: occupancy dropped, the fast path survived
        assert r.scene is r._exact_scene
        assert r.spec.fast_fine and r.spec.coarse_exit_segments == 3
        assert r.fidelity_db is not None and r.fidelity_db >= 30.0


class TestVideoAndMisc:
    def test_write_video(self, tmp_path):
        from stnerf_tpu.render.video import write_video

        frames = [np.full((16, 16, 3), i * 40, np.uint8) for i in range(5)]
        out = write_video(str(tmp_path / "clip.mp4"), frames, fps=5)
        assert os.path.exists(out) and os.path.getsize(out) > 0

    def test_vis_density(self):
        from stnerf_tpu.models import SpaceNetSpec, init_spacenet
        from stnerf_tpu.utils import vis_density

        spec = SpaceNetSpec(backbone_dim=16, head_dim=8, use_time=False)
        params = init_spacenet(jax.random.PRNGKey(0), spec)
        grid = vis_density(params, spec, np.array([[-1.0, -1, -1], [1, 1, 1]]),
                           L=8, chunk=256)
        assert grid.shape == (8, 8, 8)
        assert (grid >= 0).all()

    def test_corrupt_cameras(self, rng):
        from stnerf_tpu.utils import corrupt_cameras

        poses = np.tile(np.eye(4, dtype=np.float32)[None], (5, 1, 1))
        out = corrupt_cameras(poses, rng=rng)
        assert out.shape == (5, 4, 4)
        assert np.abs(out[:, :3, 3]).max() <= 0.1 + 1e-6
        for R in out[:, :3, :3]:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
