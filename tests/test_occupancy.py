"""Occupancy-driven box refinement (render/occupancy.py): exactness at
tau=0, containment, no-occupancy fallback, localization of a known occupied
sub-region, and the disk cache."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stnerf_tpu.models import LayeredSpec, SceneBoxes, init_layered_params
from stnerf_tpu.render import occupancy
from stnerf_tpu.render.occupancy import (_shrink, refine_scene_boxes,
                                         refined_boxes_cached)

SPEC = LayeredSpec(layer_num=2, coarse_samples=8, fine_samples=4,
                   sample_method="BBOX", use_space_time=True,
                   use_deform_time=True, backbone_dim=16, head_dim=8,
                   motion_dim=8, compute_dtype="float32")
GRID = 8


def make_scene(frames=3, zero_row=True):
    bkgd = jnp.array([[-6.0, -6.0, -6.0], [6.0, 6.0, 6.0]])
    boxes = np.zeros((frames, 2, 2, 3), np.float32)
    for f in range(frames):
        if zero_row and f == 0:
            continue  # FRAME_OFFSET-style degenerate padding row
        boxes[f, 0] = [[-1 + 0.1 * f, -1, 1], [1 + 0.1 * f, 1, 3]]
        boxes[f, 1] = [[-1, 2, 1], [1, 4, 3]]
    return SceneBoxes(bkgd, jnp.array(boxes), jnp.array([0.5, 12.0]))


@pytest.fixture(scope="module")
def setup():
    params = init_layered_params(jax.random.PRNGKey(0), SPEC)
    return params, make_scene()


def test_tau_zero_is_exact_roundtrip(setup):
    """relu(sigma) >= 0 everywhere, so tau=0 occupies every voxel and each
    box must come back bit-identical (the documented exactness guarantee)."""
    params, scene = setup
    out = refine_scene_boxes(params, SPEC, scene, grid=GRID, sigma_thresh=0.0)
    np.testing.assert_array_equal(np.asarray(out.boxes),
                                  np.asarray(scene.boxes))
    np.testing.assert_array_equal(np.asarray(out.bkgd_box),
                                  np.asarray(scene.bkgd_box))


def test_containment_and_degenerate_rows(setup):
    params, scene = setup
    out = refine_scene_boxes(params, SPEC, scene, grid=GRID, sigma_thresh=0.05)
    orig, new = np.asarray(scene.boxes), np.asarray(out.boxes)
    assert new.shape == orig.shape
    assert np.all(new[..., 0, :] >= orig[..., 0, :] - 1e-6)
    assert np.all(new[..., 1, :] <= orig[..., 1, :] + 1e-6)
    # the zero padding row is untouched
    np.testing.assert_array_equal(new[0], orig[0])


def test_no_occupancy_keeps_original(setup):
    params, scene = setup
    out = refine_scene_boxes(params, SPEC, scene, grid=GRID,
                             sigma_thresh=1e9)
    np.testing.assert_array_equal(np.asarray(out.boxes),
                                  np.asarray(scene.boxes))


def test_known_subregion_localized(setup, monkeypatch):
    """With the field stubbed to an indicator of a known sub-box, the refined
    box must cover it within one voxel + the dilation pad on every side."""
    params, scene = setup
    target_lo = np.array([-0.4, -0.5, 1.5], np.float32)
    target_hi = np.array([0.2, 0.3, 2.1], np.float32)

    def fake_spacenet(p, sspec, xyz, dirs, times, dtype=None):
        inside = jnp.all((xyz >= target_lo[:, None, None, None])
                         & (xyz <= target_hi[:, None, None, None]), axis=0)
        sig = jnp.where(inside, 10.0, 0.0)
        return jnp.zeros_like(xyz), sig

    monkeypatch.setattr(occupancy, "apply_spacenet_planar", fake_spacenet)
    # identity motion so world coords hit the indicator directly
    monkeypatch.setattr(occupancy, "apply_motionnet_planar",
                        lambda *a, **k: jnp.zeros_like(a[2]))
    occupancy._occupancy_cube.clear_cache()
    try:
        grid = 16
        out = refine_scene_boxes(params, SPEC, scene, grid=grid,
                                 sigma_thresh=1.0, pad_voxels=1)
        new = np.asarray(out.boxes)[1, 0]   # frame 2, layer 1 (non-degenerate)
        orig = np.asarray(scene.boxes)[1, 0]
        voxel = (orig[1] - orig[0]) / grid
        # contains the target region...
        assert np.all(new[0] <= target_lo + 1e-5)
        assert np.all(new[1] >= target_hi - 1e-5)
        # ...and is tight to within (1 voxel quantization + 1 pad voxel)
        assert np.all(new[0] >= target_lo - 2 * voxel - 1e-5)
        assert np.all(new[1] <= target_hi + 2 * voxel + 1e-5)
    finally:
        occupancy._occupancy_cube.clear_cache()


def test_cache_roundtrip(setup, tmp_path):
    params, scene = setup
    ckpt = tmp_path / "fake.ckpt"
    ckpt.write_bytes(b"x")
    a = refined_boxes_cached(params, SPEC, scene, str(tmp_path), str(ckpt),
                             grid=GRID, sigma_thresh=0.05)
    cached = list(tmp_path.glob("occ_boxes_*.npz"))
    assert len(cached) == 1
    b = refined_boxes_cached(params, SPEC, scene, str(tmp_path), str(ckpt),
                             grid=GRID, sigma_thresh=0.05)
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))


def test_renderer_wiring(tmp_path_factory):
    """TPU.OCCUPANCY_SKIP through the real renderer ctor: boxes refined,
    contained in the originals, and the cache file lands in OUTPUT_DIR.
    Without a checkpoint on disk the refine must NOT run (a fresh field's
    occupancy is meaningless — render/renderer.py guard)."""
    import glob

    from stnerf_tpu.data.synthetic import make_synthetic_scene, synthetic_cfg
    from stnerf_tpu.engine.checkpoint import save_checkpoint
    from stnerf_tpu.models import init_layered_params
    from stnerf_tpu.models.layered import LayeredSpec
    from stnerf_tpu.render.renderer import LayeredNeuralRenderer

    root = str(tmp_path_factory.mktemp("occ_scene"))
    out = str(tmp_path_factory.mktemp("occ_out"))
    make_synthetic_scene(root, width=60, height=45, num_cams=4, num_frames=2)
    cfg = synthetic_cfg(root, 60, 45, 2)
    cfg.OUTPUT_DIR = out
    cfg.TPU.USE_PALLAS = False
    cfg.TPU.COMPUTE_DTYPE = "float32"  # this CPU backend has no bf16 dot
    cfg.TPU.OCCUPANCY_SKIP = True
    cfg.TPU.OCC_GRID = 8
    cfg.TPU.OCC_AUTO_TAU = False
    cfg.TPU.OCC_SIGMA_THRESH = 0.05
    cfg.TPU.FIDELITY_GATE = False   # gate has its own test; keep this small
    cfg.freeze()

    # no checkpoint: fresh params, occupancy refine skipped entirely
    r_fresh = LayeredNeuralRenderer(cfg)
    assert r_fresh.scene is r_fresh._exact_scene
    assert not glob.glob(os.path.join(out, "occ_boxes_*.npz"))

    save_checkpoint(out, init_layered_params(
        jax.random.PRNGKey(0), LayeredSpec.from_cfg(cfg)), None, 1)
    r = LayeredNeuralRenderer(cfg)
    orig = np.asarray(r.dataset.scene_boxes.boxes)
    new = np.asarray(r.scene.boxes)
    assert new.shape == orig.shape
    assert np.all(new[..., 0, :] >= orig[..., 0, :] - 1e-6)
    assert np.all(new[..., 1, :] <= orig[..., 1, :] + 1e-6)
    assert glob.glob(os.path.join(out, "occ_boxes_*.npz"))


def test_slices_tau_zero_render_bit_exact(setup):
    """OCC_SLICES at tau=0: every voxel is occupied, so the K slices tile
    each original box and the sampler's union interval [min enter, max exit]
    is bitwise the single-box interval (same binding slab planes) — the
    whole render must be identical, including the degenerate padding row
    (K duplicate zero boxes all miss)."""
    from stnerf_tpu.models import EditState, RayInputs, render_rays

    params, scene = setup
    sliced = refine_scene_boxes(params, SPEC, scene, grid=GRID,
                                sigma_thresh=0.0, slices=3)
    assert np.asarray(sliced.boxes).shape == (3, 2, 3, 2, 3)

    n = 12
    o = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (n, 1))
    d = np.stack([np.linspace(-0.5, 0.5, n).astype(np.float32),
                  np.linspace(-0.2, 0.6, n).astype(np.float32),
                  np.ones(n, np.float32)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    inputs = RayInputs(jnp.array(o), jnp.array(d),
                       jnp.full((n, 3), 2.0, jnp.float32),
                       jnp.zeros((n,), jnp.float32),
                       jnp.tile(jnp.array([[0.5, 12.0]], jnp.float32), (n, 1)))
    render = jax.jit(render_rays, static_argnames=("spec", "only_coarse"))
    a = render(params, SPEC, scene, inputs, EditState.identity(2),
               key=jax.random.PRNGKey(3))
    b = render(params, SPEC, sliced, inputs, EditState.identity(2),
               key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.fine.color),
                                  np.asarray(b.fine.color))
    np.testing.assert_array_equal(np.asarray(a.fine.depth),
                                  np.asarray(b.fine.depth))


def test_slices_localize_two_blobs(setup, monkeypatch):
    """With the field stubbed to two blobs at opposite ends of the box, the
    slices along the dominant axis must cut out the empty middle: union
    slice volume < single-AABB volume, and each blob stays covered."""
    params, scene = setup
    blob_a = (np.array([-0.9, -0.9, 1.1], np.float32),
              np.array([-0.5, -0.5, 1.5], np.float32))
    blob_b = (np.array([0.5, 0.5, 2.5], np.float32),
              np.array([0.9, 0.9, 2.9], np.float32))

    def fake_spacenet(p, sspec, xyz, dirs, times, dtype=None):
        def inside(lo, hi):
            return jnp.all((xyz >= lo[:, None, None, None])
                           & (xyz <= hi[:, None, None, None]), axis=0)
        sig = jnp.where(inside(*blob_a) | inside(*blob_b), 10.0, 0.0)
        return jnp.zeros_like(xyz), sig

    monkeypatch.setattr(occupancy, "apply_spacenet_planar", fake_spacenet)
    monkeypatch.setattr(occupancy, "apply_motionnet_planar",
                        lambda *a, **k: jnp.zeros_like(a[2]))
    occupancy._occupancy_cube.clear_cache()
    try:
        grid, K = 16, 4
        out = refine_scene_boxes(params, SPEC, scene, grid=grid,
                                 sigma_thresh=1.0, pad_voxels=0, slices=K)
        new = np.asarray(out.boxes)[1, 0]      # (K, 2, 3): frame 2, layer 1
        orig = np.asarray(scene.boxes)[1, 0]
        vol = lambda b: np.prod(np.maximum(b[..., 1, :] - b[..., 0, :], 0.0),
                                axis=-1)
        aabb_vol = vol(np.stack([new[:, 0].min(0), new[:, 1].max(0)]))
        assert vol(new).sum() < 0.5 * aabb_vol
        # both blobs covered by some slice (within one voxel quantization)
        voxel = (orig[1] - orig[0]) / grid
        for lo, hi in (blob_a, blob_b):
            covered = np.any(np.all(new[:, 0] <= lo + voxel, axis=1)
                             & np.all(new[:, 1] >= hi - voxel, axis=1))
            assert covered
    finally:
        occupancy._occupancy_cube.clear_cache()


class TestStratifiedUnion:
    """ops.sampling.stratified_union: the within-union gap-skip sampler."""

    def test_single_interval_matches_between(self):
        from stnerf_tpu.ops.sampling import (stratified_between,
                                             stratified_union)
        t_n = jnp.array([[1.0], [2.0]])
        t_f = jnp.array([[4.0], [8.0]])
        hit = jnp.ones((2, 1), bool)
        key = jax.random.PRNGKey(5)
        a = stratified_union(t_n, t_f, hit, 16, key)
        b = stratified_between(t_n[:, 0], t_f[:, 0], 16, key)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_replicated_duplicates_merge(self):
        """A box replicated across K slices (the occupancy default for
        unrefined layers) must union to the single interval, not K copies."""
        from stnerf_tpu.ops.sampling import (stratified_between,
                                             stratified_union)
        K = 4
        t_n = jnp.tile(jnp.array([[1.5]]), (3, K))
        t_f = jnp.tile(jnp.array([[6.5]]), (3, K))
        hit = jnp.ones((3, K), bool)
        a = stratified_union(t_n, t_f, hit, 8, None)
        b = stratified_between(t_n[:, 0], t_f[:, 0], 8, None)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_gap_receives_no_samples(self):
        """Two disjoint intervals: every sample inside one of them, none in
        the gap, ascending order, counts proportional to interval lengths
        (det mode), arbitrary slice order."""
        from stnerf_tpu.ops.sampling import stratified_union
        # deliberately unsorted: [4, 6] before [1, 2]
        t_n = jnp.array([[4.0, 1.0]])
        t_f = jnp.array([[6.0, 2.0]])
        hit = jnp.ones((1, 2), bool)
        t = np.asarray(stratified_union(t_n, t_f, hit, 12, None))[0]
        assert np.all(np.diff(t) > 0)
        in_a = (t >= 1.0) & (t <= 2.0)
        in_b = (t >= 4.0) & (t <= 6.0)
        assert np.all(in_a | in_b)
        assert in_a.sum() == 4 and in_b.sum() == 8  # 1:2 length ratio

    def test_overlapping_intervals_merge(self):
        """Dilated sub-boxes overlap; the union measure must not double-count
        the overlap (samples uniform over [1, 5], not denser in [2, 3])."""
        from stnerf_tpu.ops.sampling import (stratified_between,
                                             stratified_union)
        t_n = jnp.array([[1.0, 2.0]])
        t_f = jnp.array([[3.0, 5.0]])
        hit = jnp.ones((1, 2), bool)
        a = stratified_union(t_n, t_f, hit, 16, None)
        b = stratified_between(jnp.array([1.0]), jnp.array([5.0]), 16, None)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_last_bin_draw_near_one_stays_in_union(self, monkeypatch):
        """ADVICE r3 regression: a uniform draw within ~2^-18 of 1 in the
        last bin used to round (bins+u)/num up to exactly 1, push u to the
        full union measure, miss every one-hot interval and emit t = total —
        out of ascending order and inside the skipped gap. The fix clamps the
        normalized position below 1 and the in-interval offset by length:
        every sample must stay inside the union and stay monotone."""
        import stnerf_tpu.ops.sampling as sampling

        worst = np.float32(1.0) - np.float32(2.0) ** -24

        def draws(key, shape, dtype=jnp.float32):
            # all bins at the worst-case draw: every sample sits at its
            # bin's far edge, the last one at the union's far edge
            return jnp.full(shape, worst, dtype)

        monkeypatch.setattr(jax.random, "uniform", draws)
        # intervals [1, 2] u [10, 13]: the advisor's repro emitted t = 4.0
        # (the union measure) after samples at t ~ 12.9
        t_n = jnp.array([[1.0, 10.0]])
        t_f = jnp.array([[2.0, 13.0]])
        hit = jnp.ones((1, 2), bool)
        t = np.asarray(sampling.stratified_union(
            t_n, t_f, hit, 64, jax.random.PRNGKey(0)))[0]
        in_a = (t >= 1.0) & (t <= 2.0)
        in_b = (t >= 10.0) & (t <= 13.0)
        assert np.all(in_a | in_b), t[~(in_a | in_b)]
        assert np.all(np.diff(t) >= 0)

    def test_contained_and_missed_slices(self):
        from stnerf_tpu.ops.sampling import (MISS_T, stratified_between,
                                             stratified_union)
        # slice 1 inside slice 0, slice 2 missed -> union is slice 0
        t_n = jnp.array([[1.0, 2.0, -7.0]])
        t_f = jnp.array([[5.0, 3.0, -6.0]])
        hit = jnp.array([[True, True, False]])
        a = stratified_union(t_n, t_f, hit, 8, None)
        b = stratified_between(jnp.array([1.0]), jnp.array([5.0]), 8, None)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        # all slices missed -> sentinel
        none = stratified_union(t_n, t_f, jnp.zeros((1, 3), bool), 8, None)
        np.testing.assert_array_equal(np.asarray(none),
                                      np.full((1, 8), MISS_T, np.float32))


def test_gap_skip_tau_zero_render_close(setup):
    """TPU.OCC_GAP_SKIP at tau=0: slices tile each box, the union measure is
    the hull interval's, and the gap-skip sampler must reproduce the exact
    render to fp tolerance (same jitter draws — both paths split the same
    per-layer keys)."""
    import dataclasses

    from stnerf_tpu.models import EditState, RayInputs, render_rays

    params, scene = setup
    sliced = refine_scene_boxes(params, SPEC, scene, grid=GRID,
                                sigma_thresh=0.0, slices=3)
    spec_gap = dataclasses.replace(SPEC, occ_gap_skip=True)

    n = 12
    o = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (n, 1))
    d = np.stack([np.linspace(-0.5, 0.5, n).astype(np.float32),
                  np.linspace(-0.2, 0.6, n).astype(np.float32),
                  np.ones(n, np.float32)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    inputs = RayInputs(jnp.array(o), jnp.array(d),
                       jnp.full((n, 3), 2.0, jnp.float32),
                       jnp.zeros((n,), jnp.float32),
                       jnp.tile(jnp.array([[0.5, 12.0]], jnp.float32), (n, 1)))
    render = jax.jit(render_rays, static_argnames=("spec", "only_coarse"))
    a = render(params, SPEC, scene, inputs, EditState.identity(2),
               key=jax.random.PRNGKey(3))
    b = render(params, spec_gap, sliced, inputs, EditState.identity(2),
               key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_allclose(np.asarray(a.fine.color),
                               np.asarray(b.fine.color), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.fine.depth),
                               np.asarray(b.fine.depth), atol=2e-3)


def test_shrink_math():
    box = np.array([[0.0, 0.0, 0.0], [8.0, 8.0, 8.0]], np.float32)
    out = _shrink(box, lo_idx=[2, 0, 7], hi_idx=[5, 0, 7], grid=8, pad=1)
    # axis 0: [2-1, 5+1+1] voxels -> [1, 7]; axis 1 clamps at 0; axis 2 at 8
    np.testing.assert_allclose(out[0], [1.0, 0.0, 6.0])
    np.testing.assert_allclose(out[1], [7.0, 2.0, 8.0])


class TestAutoTau:
    """Quality-bounded automatic occupancy threshold: auto_tau picks the
    largest tau whose culled voxels' worst-case per-ray alpha
    (_culled_alpha_bound) stays within the PSNR budget, and
    refine_scene_boxes(auto_tau_db=...) degrades to the exact box when
    nothing fits."""

    def test_bound_covers_axis_column_rays(self):
        from stnerf_tpu.render.occupancy import _culled_alpha_bound

        rng = np.random.default_rng(0)
        g = 12
        sig = rng.exponential(0.3, size=(g, g, g)).astype(np.float32)
        keep = np.zeros((g, g, g), bool)
        keep[3:9, 2:7, 4:11] = True
        box = np.array([[-1.0, -2.0, 0.5], [1.5, 1.0, 3.0]], np.float32)
        bound = _culled_alpha_bound(sig, keep, box, g)
        s = np.where(keep, 0.0, sig)
        voxel = (box[1] - box[0]) / g
        for a in range(3):
            depth = (s.sum(axis=a) * voxel[a]).max()
            assert bound >= -np.expm1(-depth) - 1e-7

    def test_auto_tau_zero_field(self):
        from stnerf_tpu.render.occupancy import auto_tau

        box = np.array([[0.0, 0, 0], [1.0, 1, 1]], np.float32)
        tau, bound = auto_tau(np.zeros((8, 8, 8), np.float32), box, 8, 1,
                              eps_alpha=0.005)
        assert tau == 0.0 and bound == 0.0

    def test_auto_tau_culls_faint_halo_keeps_blob(self):
        from stnerf_tpu.render.occupancy import (_culled_alpha_bound,
                                                 _eps_alpha, _hull_keep_mask,
                                                 auto_tau)

        g = 16
        sig = np.full((g, g, g), 1e-3, np.float32) * 0.5   # faint halo
        sig[6:10, 6:10, 6:10] = 50.0                        # the performer
        box = np.array([[-1.0, -1, 1], [1.0, 1, 3]], np.float32)
        eps = _eps_alpha(40.0)
        tau, bound = auto_tau(sig, box, g, 1, eps)
        assert tau > 1e-3          # halo culled, not kept
        assert bound <= eps        # returned operating point is in budget
        keep = _hull_keep_mask(sig >= tau, g, 1)
        # the blob (and its pad voxel) is inside the kept hull
        assert keep[6:10, 6:10, 6:10].all()
        # hull is tight: pad=1 around the blob span [6,10) -> [5, 11)
        assert not keep[4].any() and not keep[11].any()
        assert _culled_alpha_bound(sig, keep, box, g) <= eps

    def test_auto_tau_exact_fallback_huge_faint_box(self):
        """A kilometre-scale box of sub-candidate sigma: every candidate tau
        culls matter whose integral blows the budget -> tau 0 (exact)."""
        from stnerf_tpu.render.occupancy import auto_tau

        g = 8
        sig = np.full((g, g, g), 9e-4, np.float32)
        box = np.array([[0.0, 0, 0], [1000.0, 1000, 1000]], np.float32)
        tau, _ = auto_tau(sig, box, g, 1, eps_alpha=0.005)
        assert tau == 0.0

    def test_refine_auto_localizes_indicator(self, setup, monkeypatch):
        """auto_tau_db through refine_scene_boxes with the indicator field:
        same localization as the manual-threshold path, no knob needed."""
        params, scene = setup
        target_lo = np.array([-0.4, -0.5, 1.5], np.float32)
        target_hi = np.array([0.2, 0.3, 2.1], np.float32)

        def fake_spacenet(p, sspec, xyz, dirs, times, dtype=None):
            inside = jnp.all((xyz >= target_lo[:, None, None, None])
                             & (xyz <= target_hi[:, None, None, None]), axis=0)
            return jnp.zeros_like(xyz), jnp.where(inside, 10.0, 0.0)

        monkeypatch.setattr(occupancy, "apply_spacenet_planar", fake_spacenet)
        monkeypatch.setattr(occupancy, "apply_motionnet_planar",
                            lambda *a, **k: jnp.zeros_like(a[2]))
        occupancy._occupancy_cube.clear_cache()
        try:
            grid = 16
            out = refine_scene_boxes(params, SPEC, scene, grid=grid,
                                     pad_voxels=1, auto_tau_db=40.0)
            new = np.asarray(out.boxes)[1, 0]
            orig = np.asarray(scene.boxes)[1, 0]
            voxel = (orig[1] - orig[0]) / grid
            assert np.all(new[0] <= target_lo + 1e-5)
            assert np.all(new[1] >= target_hi - 1e-5)
            assert np.all(new[0] >= target_lo - 2 * voxel - 1e-5)
            assert np.all(new[1] <= target_hi + 2 * voxel + 1e-5)
        finally:
            occupancy._occupancy_cube.clear_cache()

    def test_slice_tau_keeps_gap_matter(self, setup, monkeypatch):
        """Two strong blobs joined by a faint (sigma 0.5) tube: the hull tau
        lands high (outside-hull sigma is 0, any threshold is
        hull-admissible), and slicing at THAT tau would cull the tube — the
        slice-specific tau search (auto_slice_tau) must instead descend to
        a threshold that keeps the tube inside the slice union, so nothing
        real is culled while the slices still tighten cross-extents."""
        params, scene = setup
        blob_a = (np.array([-0.8, -0.2, 1.8], np.float32),
                  np.array([-0.4, 0.2, 2.2], np.float32))
        blob_b = (np.array([0.5, -0.2, 1.8], np.float32),
                  np.array([0.9, 0.2, 2.2], np.float32))
        tube = (np.array([-0.4, -0.2, 1.8], np.float32),
                np.array([0.5, 0.2, 2.2], np.float32))

        def fake_spacenet(p, sspec, xyz, dirs, times, dtype=None):
            def inside(lo, hi):
                return jnp.all((xyz >= lo[:, None, None, None])
                               & (xyz <= hi[:, None, None, None]), axis=0)
            sig = jnp.where(inside(*blob_a) | inside(*blob_b), 10.0,
                            jnp.where(inside(*tube), 0.5, 0.0))
            return jnp.zeros_like(xyz), sig

        monkeypatch.setattr(occupancy, "apply_spacenet_planar", fake_spacenet)
        monkeypatch.setattr(occupancy, "apply_motionnet_planar",
                            lambda *a, **k: jnp.zeros_like(a[2]))
        occupancy._occupancy_cube.clear_cache()
        try:
            out = refine_scene_boxes(params, SPEC, scene, grid=16,
                                     pad_voxels=0, slices=4,
                                     auto_tau_db=40.0)
            new = np.asarray(out.boxes)[1, 0]           # (K, 2, 3)
            # the union of slices must cover the tube (nothing real culled)
            lo = np.minimum.reduce([b[0] for b in new])
            hi = np.maximum.reduce([b[1] for b in new])
            assert np.all(lo <= tube[0] + 1e-5), (lo, tube[0])
            assert np.all(hi >= tube[1] - 1e-5), (hi, tube[1])
            # ... and every matter voxel sits inside SOME slice
            from stnerf_tpu.render.occupancy import (_boxes_keep_mask,
                                                     _culled_alpha_bound,
                                                     _eps_alpha)
            orig = np.asarray(scene.boxes)[1, 0]
            sig = np.asarray(occupancy._occupancy_cube(
                occupancy._layer_net_params(params, SPEC, 1), SPEC,
                jnp.asarray(orig), jnp.float32(2.0), bkgd=False, grid=16),
                np.float32)
            keep = _boxes_keep_mask(orig, new, 16)
            assert _culled_alpha_bound(sig, keep, orig, 16) <= _eps_alpha(40.0)
        finally:
            occupancy._occupancy_cube.clear_cache()

    def test_slices_fall_back_when_nothing_fits(self, setup, monkeypatch):
        """A box uniformly full of strong sigma: every slice tau culls real
        matter (cross-extents cannot tighten without cutting the field), so
        the per-frame search finds no admissible threshold... but a full box
        slices into exact tiles (nothing culled). Make the field full-box
        PLUS corner spikes the slicer's index rounding must not cover: if
        no admissible tau exists the hull box is replicated; either way the
        culling bound never exceeds the budget."""
        params, scene = setup

        def fake_spacenet(p, sspec, xyz, dirs, times, dtype=None):
            # dense everywhere: slices tile the whole box -> exact, fine
            return jnp.zeros_like(xyz), jnp.full_like(xyz[0], 5.0)

        monkeypatch.setattr(occupancy, "apply_spacenet_planar", fake_spacenet)
        monkeypatch.setattr(occupancy, "apply_motionnet_planar",
                            lambda *a, **k: jnp.zeros_like(a[2]))
        occupancy._occupancy_cube.clear_cache()
        try:
            out = refine_scene_boxes(params, SPEC, scene, grid=16,
                                     pad_voxels=0, slices=4,
                                     auto_tau_db=40.0)
            new = np.asarray(out.boxes)[1, 0]           # (K, 2, 3)
            orig = np.asarray(scene.boxes)[1, 0]
            from stnerf_tpu.render.occupancy import (_boxes_keep_mask,
                                                     _culled_alpha_bound,
                                                     _eps_alpha)
            sig = np.full((16, 16, 16), 5.0, np.float32)
            keep = _boxes_keep_mask(orig, new, 16)
            assert _culled_alpha_bound(sig, keep, orig, 16) <= _eps_alpha(40.0)
            # union covers the whole box (nothing culled from a full field)
            lo = np.minimum.reduce([b[0] for b in new])
            hi = np.maximum.reduce([b[1] for b in new])
            np.testing.assert_allclose(lo, orig[0], atol=1e-5)
            np.testing.assert_allclose(hi, orig[1], atol=1e-5)
        finally:
            occupancy._occupancy_cube.clear_cache()
