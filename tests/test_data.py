"""Data pipeline tests: PLY IO, camera loaders, ray generation geometry,
the synthetic scene, caching, and the train-pool build."""

import os

import numpy as np
import pytest

from stnerf_tpu.data import (FrameLayerScene, JointTransform, RenderScene,
                             ViewScene, build_ray_pool, corners_from_minmax,
                             load_camposes, load_intrinsics, lookat,
                             make_synthetic_scene, pixel_rays,
                             project_bbox_roi, read_ply_points,
                             synthetic_cfg, write_ply_points)
from stnerf_tpu.data.synthetic import performer_center, raycast
from stnerf_tpu.models.layered import LayeredSpec


class TestPly:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, rng, binary):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "x.ply")
        write_ply_points(p, pts, binary=binary)
        out = read_ply_points(p)
        np.testing.assert_allclose(out, pts, atol=1e-5)

    def test_extra_properties_binary(self, tmp_path):
        # vertex with colors: x y z r g b
        path = str(tmp_path / "c.ply")
        n = 5
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n"
                    b"element vertex 5\n"
                    b"property float x\nproperty float y\nproperty float z\n"
                    b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
                    b"end_header\n")
            dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                           ("r", "u1"), ("g", "u1"), ("b", "u1")])
            arr = np.zeros(n, dt)
            arr["x"] = np.arange(n)
            f.write(arr.tobytes())
        out = read_ply_points(path)
        assert out.shape == (5, 3)
        np.testing.assert_allclose(out[:, 0], np.arange(n))


class TestCameras:
    def test_pixel_rays_geometry(self):
        K = np.array([[100.0, 0, 50], [0, 100, 40], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        rays = pixel_rays(K, c2w, 80, 100)
        assert rays.shape == (8000, 6)
        # center pixel (v=40, u=50) looks straight down +z
        center = rays[40 * 100 + 50]
        np.testing.assert_allclose(center[:3], 0, atol=1e-6)
        np.testing.assert_allclose(center[3:], [0, 0, 1], atol=1e-5)
        # directions unit-norm
        np.testing.assert_allclose(np.linalg.norm(rays[:, 3:], axis=1), 1, atol=1e-5)

    def test_lookat_points_at_center(self):
        eye = np.array([3.0, 1.0, 2.0])
        c2w = lookat(eye, np.zeros(3), np.array([0.0, 1.0, 0.0]))
        K = np.array([[50.0, 0, 25], [0, 50, 25], [0, 0, 1]], np.float32)
        rays = pixel_rays(K, c2w, 50, 50)
        center_dir = rays[25 * 50 + 25, 3:]
        expect = -eye / np.linalg.norm(eye)
        np.testing.assert_allclose(center_dir, expect, atol=1e-2)

    def test_project_bbox_roi(self):
        K = np.array([[100.0, 0, 50], [0, 100, 40], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        corners = corners_from_minmax(np.array([-0.1, -0.1, 1.9]),
                                      np.array([0.1, 0.1, 2.1]))
        minh, maxh, minw, maxw = project_bbox_roi(corners, K, c2w, 80, 100)
        assert 30 < minh < 40 < maxh < 50
        assert 40 < minw < 50 < maxw < 60

    def test_loaders_roundtrip(self, tmp_path):
        poses = np.random.default_rng(0).normal(size=(3, 3, 4))
        np.savetxt(tmp_path / "RT_c2w.txt", poses.reshape(3, 12))
        Ks = np.tile(np.eye(3).reshape(1, 9), (3, 1))
        np.savetxt(tmp_path / "K.txt", Ks)
        T = load_camposes(str(tmp_path / "RT_c2w.txt"))
        K = load_intrinsics(str(tmp_path / "K.txt"))
        assert T.shape == (3, 4, 4) and K.shape == (3, 3, 3)
        np.testing.assert_allclose(T[:, 3], [[0, 0, 0, 1]] * 3)
        np.testing.assert_allclose(T[:, :3, :], poses, atol=1e-6)


class TestTransforms:
    def test_identity_resize(self):
        t = JointTransform((30, 40), is_train=False)
        img = np.random.default_rng(0).integers(0, 255, (60, 80, 3)).astype(np.uint8)
        K = np.array([[100.0, 0, 40], [0, 100, 30], [0, 0, 1]], np.float32)
        T = np.eye(4, dtype=np.float32)
        label = np.ones((60, 80), np.uint8)
        image, lab, K2, T2, roi = t(img, K, T, label=label)
        assert image.shape == (3, 30, 40)
        assert lab.shape == (1, 30, 40)
        assert roi.shape == (1, 30, 40)
        np.testing.assert_allclose(T2, T)
        np.testing.assert_allclose(K2[0, 0], 50.0)  # scaled by 30/60
        np.testing.assert_allclose(lab, 1.0)


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    make_synthetic_scene(root, width=60, height=45, num_cams=4, num_frames=2)
    return root


class TestSynthetic:
    def test_layout(self, scene_root):
        assert os.path.exists(os.path.join(scene_root, "pose", "RT_c2w.txt"))
        assert os.path.exists(os.path.join(scene_root, "background", "0.ply"))
        assert os.path.exists(os.path.join(scene_root, "frame1", "images", "000.png"))
        assert os.path.exists(os.path.join(scene_root, "frame2", "labels", "003.npy"))
        assert os.path.exists(os.path.join(scene_root, "frame1", "pointclouds", "2.ply"))

    def test_labels_match_raycast(self, scene_root):
        lab = np.load(os.path.join(scene_root, "frame1", "labels", "000.npy"))
        assert set(np.unique(lab)) <= {0, 1, 2}
        assert (lab > 0).any(), "performers must be visible"

    def test_frame_layer_scene(self, scene_root):
        cfg = synthetic_cfg(scene_root, 60, 45, 2)
        t = JointTransform((45, 60), is_train=False)
        s = FrameLayerScene(cfg, t, 1, 1)
        c1 = performer_center(1, 1, 2)
        assert np.linalg.norm(s.center - c1) < 0.2
        assert (s.bbox[1] - s.bbox[0]).min() > 1.0  # ~2*radius
        image, label, K, T, roi, bbox, near_far, ok = s.get_data(0)
        assert ok and image.shape == (3, 45, 60)
        assert near_far[0, 0] < near_far[0, 1]
        # cache hit second time
        s2 = FrameLayerScene(cfg, t, 1, 1)
        np.testing.assert_allclose(s2.bbox, s.bbox)

    def test_build_ray_pool(self, scene_root):
        """Default (deterministic transform): compact pixel bundle."""
        cfg = synthetic_cfg(scene_root, 60, 45, 2)
        spec = LayeredSpec.from_cfg(cfg)
        pool, boxes = build_ray_pool(cfg, spec, np.random.default_rng(0))
        n = pool["pix"].shape[0]
        assert n > 1000
        assert pool["cams"].dtype == np.uint16
        assert pool["pix"].dtype == np.uint32
        assert pool["rgb"].shape == (n, 3) and pool["rgb"].dtype == np.uint8
        assert pool["frames"].shape == (n,)
        assert pool["table_inv_K"].shape == (4, 3, 3)
        assert pool["table_near_far"].shape == (3, 3, 4, 2)  # (L+1, F+1, M, 2)
        assert int(pool["width"]) == 60
        assert boxes.shape == (2, 2, 2, 3)
        assert (boxes[0, 0, 1] - boxes[0, 0, 0]).min() > 1.0
        # layer-1 rays carry label 1 (label-selected)
        l1 = pool["bbox_labels"] == 1
        assert (pool["labels"][l1] == 1).all()
        # cache reload gives identical pool
        pool2, _ = build_ray_pool(cfg, spec, np.random.default_rng(1))
        np.testing.assert_array_equal(pool2["pix"], pool["pix"])

    def test_compact_host_decode_matches_legacy(self, tmp_path_factory):
        """decode_pool_host(compact bundle) reproduces the legacy f32 pool
        bit-for-bit in rgb/labels/near_fars and to float tolerance in rays
        (identical math, different association)."""
        from stnerf_tpu.data import decode_pool_host

        root = str(tmp_path_factory.mktemp("scene_codec"))
        make_synthetic_scene(root, width=60, height=45, num_cams=4,
                             num_frames=2)
        cfg = synthetic_cfg(root, 60, 45, 2)
        cfg.TPU.POOL_HIT_ORDER = False   # row-for-row comparison needs
        spec = LayeredSpec.from_cfg(cfg)  # assembly order on both sides
        legacy, _ = build_ray_pool(cfg, spec, np.random.default_rng(0),
                                   compact=False)
        bundle, _ = build_ray_pool(cfg, spec, np.random.default_rng(0),
                                   compact=True)
        dec = decode_pool_host(bundle, spec)
        assert dec["rays"].shape == legacy["rays"].shape
        np.testing.assert_allclose(dec["rays"], legacy["rays"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(dec["rgbs"], legacy["rgbs"])
        np.testing.assert_array_equal(dec["labels"], legacy["labels"])
        np.testing.assert_allclose(dec["near_fars"], legacy["near_fars"],
                                   rtol=1e-6)

    def test_build_ray_pool_cap(self, scene_root):
        """MAX_POOL_RAYS uniformly subsamples the assembled pool (HBM /
        upload budget for capture-scale scenes) — tables stay whole."""
        cfg = synthetic_cfg(scene_root, 60, 45, 2)
        cfg.DATASETS.MAX_POOL_RAYS = 500
        spec = LayeredSpec.from_cfg(cfg)
        pool, _ = build_ray_pool(cfg, spec, np.random.default_rng(0))
        assert pool["pix"].shape[0] == 500
        assert pool["rgb"].shape == (500, 3)
        assert pool["table_inv_K"].shape == (4, 3, 3)
        # subsample keeps rays from several layers
        assert len(np.unique(pool["bbox_labels"])) >= 2

    def test_hit_ordered_pool(self, tmp_path_factory):
        """TPU.POOL_HIT_ORDER (default): the compact pool comes back sorted
        by (frame, bbox-hit-pattern) keys, flagged ``hit_ordered``, and is
        exactly a row permutation of the unordered assembly."""
        from stnerf_tpu.data.raygen import pool_hit_keys

        root = str(tmp_path_factory.mktemp("scene_ho"))
        make_synthetic_scene(root, width=60, height=45, num_cams=4,
                             num_frames=2)
        cfg = synthetic_cfg(root, 60, 45, 2)
        assert cfg.TPU.POOL_HIT_ORDER
        spec = LayeredSpec.from_cfg(cfg)
        ordered, boxes = build_ray_pool(cfg, spec, np.random.default_rng(0))
        assert int(ordered["hit_ordered"]) == 1
        keys = pool_hit_keys(ordered, boxes)
        assert np.all(np.diff(keys) >= 0), "pool not key-sorted"
        assert len(np.unique(keys)) > 2, "degenerate grouping"

        cfg2 = synthetic_cfg(root, 60, 45, 2)
        cfg2.TPU.POOL_HIT_ORDER = False
        plain, _ = build_ray_pool(cfg2, spec, np.random.default_rng(0))
        n = plain["pix"].shape[0]
        assert ordered["pix"].shape[0] == n

        def canon(pool):
            o = np.lexsort((pool["pix"], pool["cams"], pool["frames"],
                            pool["bbox_labels"]))
            return {k: np.asarray(v)[o] for k, v in pool.items()
                    if getattr(v, "ndim", 0) >= 1 and v.shape[0] == n}

        a, b = canon(ordered), canon(plain)
        for k in b:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"column {k}")

    def test_articulated_scene_statistics(self, tmp_path_factory):
        """blobs>1 + label_noise: the PLY-derived hull boxes span the
        articulated body (growing as the limbs spread), enclose interior
        gap volume a single sphere would not, and labels carry a bounded
        amount of boundary-biased noise while images stay exact."""
        from stnerf_tpu.data.synthetic import (SPHERE_RADIUS, blob_geometry,
                                               raycast)

        root = str(tmp_path_factory.mktemp("scene_artic"))
        make_synthetic_scene(root, width=60, height=45, num_cams=3,
                             num_frames=3, blobs=3, blob_spread=1.2,
                             label_noise=0.15)
        cfg = synthetic_cfg(root, 60, 45, 3)
        spec = LayeredSpec.from_cfg(cfg)
        _, boxes = build_ray_pool(cfg, spec, np.random.default_rng(0))

        # hull must cover every blob of every (frame, layer) and articulate
        # open: last frame's hull strictly bigger than the first's
        for f in range(3):
            for l in (1, 2):
                cs, rs = blob_geometry(l, f + 1, 3, 3, 1.2)
                lo, hi = boxes[f, l - 1]
                assert np.all(cs - rs[:, None] >= lo - 0.15)
                assert np.all(cs + rs[:, None] <= hi + 0.15)
        v = np.prod(boxes[..., 1, :] - boxes[..., 0, :], axis=-1)
        assert np.all(v[2] > 1.5 * v[0]), (v[2], v[0])
        # interior gaps: hull volume >> the blobs' total matter volume
        cs, rs = blob_geometry(1, 3, 3, 3, 1.2)
        matter = (4 / 3) * np.pi * (rs**3).sum()
        assert v[2, 0] > 3.0 * matter, (v[2, 0], matter)
        # single-sphere hull for comparison: ~ (2r)^3
        assert v[2, 0] > 2.0 * (2 * SPHERE_RADIUS) ** 3

        # labels: noisy vs the analytic raycast, but boundedly so; images
        # exact (noise touches labels only)
        from stnerf_tpu.data.cameras import pixel_rays
        K = np.loadtxt(os.path.join(root, "pose", "K.txt"))[0].reshape(3, 3)
        c2w = np.loadtxt(os.path.join(root, "pose", "RT_c2w.txt"))[0]
        c2w = c2w.reshape(3, 4)
        rays = pixel_rays(K.astype(np.float32),
                          np.vstack([c2w, [0, 0, 0, 1]]).astype(np.float32),
                          45, 60)
        rgb, clean, _ = raycast(rays[:, :3], rays[:, 3:6], 1, 3, 2, 3, 1.2)
        noisy = np.load(os.path.join(root, "frame1", "labels", "000.npy"))
        frac = (noisy.reshape(-1) != clean).mean()
        assert 0.0 < frac < 0.10, frac
        from PIL import Image
        img = np.asarray(Image.open(
            os.path.join(root, "frame1", "images", "000.png")))
        np.testing.assert_array_equal(
            img, (rgb.reshape(45, 60, 3) * 255).astype(np.uint8))

    def test_prefill_parallel_matches_serial(self, tmp_path_factory):
        """Multi-process prefill writes the same per-(frame, layer) caches a
        serial build would read: the assembled pools are identical."""
        from stnerf_tpu.data import prefill_ray_caches

        root_a = str(tmp_path_factory.mktemp("scene_par"))
        make_synthetic_scene(root_a, width=60, height=45, num_cams=4,
                             num_frames=2)
        cfg = synthetic_cfg(root_a, 60, 45, 2)
        spec = LayeredSpec.from_cfg(cfg)
        n_units = prefill_ray_caches(cfg, spec, workers=2)
        assert n_units == (2 + 1) * 2  # (layers+bkgd) x frames
        pool_par, _ = build_ray_pool(cfg, spec, np.random.default_rng(0))

        # second call: everything cached
        assert prefill_ray_caches(cfg, spec, workers=2) == 0

        # serial prefill on a fresh copy of the same scene
        root_b = str(tmp_path_factory.mktemp("scene_ser"))
        make_synthetic_scene(root_b, width=60, height=45, num_cams=4,
                             num_frames=2)
        cfg_b = synthetic_cfg(root_b, 60, 45, 2)
        assert prefill_ray_caches(cfg_b, spec, workers=1) == 6
        pool_ser, _ = build_ray_pool(cfg_b, spec, np.random.default_rng(0))
        for k in pool_par:
            np.testing.assert_allclose(pool_par[k], pool_ser[k],
                                       err_msg=f"pool key {k}")

    def test_render_scene(self, scene_root):
        cfg = synthetic_cfg(scene_root, 60, 45, 2)
        rs = RenderScene(cfg)
        assert rs.camera_num == 4
        inputs = rs.rays_for_pose(rs.poses[0], rs.Ks[0], [(0, 1), (1, 2), (2, 1)])
        assert inputs.rays_o.shape == (60 * 45, 3)
        np.testing.assert_allclose(np.asarray(inputs.frame_ids[0]), [1, 2, 1])

    def test_view_scene(self, scene_root):
        cfg = synthetic_cfg(scene_root, 60, 45, 2)
        vs = ViewScene(cfg)
        inputs, rgbs, labels, image = vs.get_fixed_image(0, 0)
        assert rgbs.shape == (60 * 45, 3)
        assert labels.shape == (60 * 45,)
        assert image.shape == (3, 45, 60)
        np.testing.assert_allclose(np.asarray(inputs.frame_ids), 1.0)


class TestRaycastConsistency:
    def test_multiview_color_consistency(self, scene_root):
        """The same 3-D point must have the same color from two cameras —
        the property the radiance field needs to learn the scene."""
        o = np.zeros((1, 3), np.float32)
        for frame in (1, 2):
            c = performer_center(1, frame, 2)
            for eye in ([4.0, 0, 0], [0, 0.5, 4.0]):
                d = (c - np.array(eye, np.float32))
                d /= np.linalg.norm(d)
                rgb, label, _ = raycast(np.array([eye], np.float32), d[None],
                                        frame, 2, 2)
                assert label[0] == 1


def test_cache_fingerprint_invalidates_on_knob_change():
    """Round-2 advisor: the pool-bundle cache must not survive changes to
    DATASETS knobs that alter ray content (CAMERA_STEPSIZE, SCALE, ...)."""
    from stnerf_tpu.config import get_cfg
    from stnerf_tpu.data.raygen import _cache_path, _cfg_fingerprint

    base = get_cfg()
    base.DATASETS.TRAIN = "/tmp/somewhere"
    f0 = _cfg_fingerprint(base)

    moved = get_cfg()
    moved.DATASETS.TRAIN = "/tmp/elsewhere"   # pure path: same fingerprint
    assert _cfg_fingerprint(moved) == f0

    for knob, val in [("CAMERA_STEPSIZE", 2), ("SCALE", 0.5),
                      ("FIXED_NEAR", 1.0), ("FIXED_FAR", 9.0),
                      ("FILE_OFFSET", 3), ("CAMERA_NUM", 7),
                      ("FIXED_LAYER", [1]), ("SHIFT", 5.0)]:
        cfg = get_cfg()
        cfg.DATASETS[knob] = val
        assert _cfg_fingerprint(cfg) != f0, knob
        assert _cache_path(cfg, 1, 0) != _cache_path(base, 1, 0), knob

    # SIZE_TRAIN folds in too
    cfg = get_cfg()
    cfg.INPUT.SIZE_TRAIN = [123, 77]
    assert _cfg_fingerprint(cfg) != f0

    # f32 pools also depend on the ray id columns the model flags choose
    spec_a = LayeredSpec(layer_num=1, pose_refinement=False)
    spec_b = LayeredSpec(layer_num=1, pose_refinement=True)
    assert (_cfg_fingerprint(base, spec_a) != _cfg_fingerprint(base, spec_b))
