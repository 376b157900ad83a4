"""End-to-end tests of the layered render core: shapes, masking, edit
semantics (hide/shift/scale/alpha), frame interpolation, determinism and
gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stnerf_tpu.models import (EditState, LayeredSpec, RayInputs, SceneBoxes,
                               compute_scale_pivot, init_layered_params,
                               render_rays, unpack_rays)

# everything goes through one jit: eager per-op dispatch compiles hundreds of
# micro-kernels, which is pathologically slow on this host
render = jax.jit(render_rays,
                 static_argnames=("spec", "only_coarse", "layer_outputs"))


SPEC = LayeredSpec(layer_num=2, coarse_samples=8, fine_samples=4,
                   sample_method="BBOX", use_space_time=True,
                   use_deform_time=True, backbone_dim=16, head_dim=8,
                   motion_dim=8, compute_dtype="float32")


def make_scene(frames=3):
    bkgd = jnp.array([[-6.0, -6.0, -6.0], [6.0, 6.0, 6.0]])
    boxes = np.zeros((frames, 2, 2, 3), np.float32)
    for f in range(frames):
        # layer 1 near origin, drifting in +x with frame; layer 2 off to +y
        boxes[f, 0] = [[-1 + 0.1 * f, -1, 1], [1 + 0.1 * f, 1, 3]]
        boxes[f, 1] = [[-1, 2, 1], [1, 4, 3]]
    return SceneBoxes(bkgd, jnp.array(boxes), jnp.array([0.5, 12.0]))


def make_rays(n=12):
    o = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (n, 1))
    # fan of directions crossing layer-1's box and some missing everything
    d = np.stack([np.linspace(-0.3, 0.3, n).astype(np.float32),
                  np.zeros(n, np.float32),
                  np.ones(n, np.float32)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return RayInputs(jnp.array(o), jnp.array(d),
                     jnp.ones((n, 3), jnp.float32),
                     jnp.zeros((n,), jnp.float32),
                     jnp.tile(jnp.array([[0.5, 12.0]], jnp.float32), (n, 1)))


@pytest.fixture(scope="module")
def setup():
    params = init_layered_params(jax.random.PRNGKey(0), SPEC)
    return params, make_scene(), make_rays()


class TestRenderCore:
    def test_shapes_and_finiteness(self, setup):
        params, scene, inputs = setup
        out = render(params, SPEC, scene, inputs, EditState.identity(2),
                          key=jax.random.PRNGKey(1))
        n = inputs.rays_o.shape[0]
        assert out.fine.color.shape == (n, 3)
        assert out.coarse.color.shape == (n, 3)
        assert out.fine_layers.color.shape == (3, n, 3)
        assert out.coarse_layers.acc.shape == (3, n, 1)
        assert out.hit.shape == (3, n)
        for leaf in jax.tree.leaves(out):
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_acc_in_unit_range(self, setup):
        params, scene, inputs = setup
        out = render(params, SPEC, scene, inputs, EditState.identity(2))
        assert float(out.fine.acc.min()) >= 0.0
        assert float(out.fine.acc.max()) <= 1.0 + 1e-4

    def test_miss_rays_have_zero_layer_acc(self, setup):
        params, scene, _ = setup
        # ray 0: boxes only intersect the *backward* extension (t < 0) — the
        # slab test flags a geometric hit (as the reference's face test does,
        # ref: layers/RaySamplePoint.py:53-62) but density clipping at
        # t<0 / t<near must zero the composite.
        # ray 1: true lateral miss — no hit flag at all.
        inputs = RayInputs(jnp.array([[0.0, 0.0, -10.0], [0.0, 0.0, -10.0]]),
                           jnp.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]]),
                           jnp.ones((2, 3)), jnp.zeros((2,)),
                           jnp.tile(jnp.array([[0.5, 12.0]]), (2, 1)))
        out = render(params, SPEC, scene, inputs, EditState.identity(2))
        assert not bool(out.hit[0, 1]) and not bool(out.hit[1, 1])
        np.testing.assert_allclose(np.asarray(out.fine.acc), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.fine_layers.acc), 0.0, atol=1e-6)

    def test_hide_layer(self, setup):
        params, scene, inputs = setup
        edits = EditState.identity(2)
        base = render(params, SPEC, scene, inputs, edits)
        hidden = render(params, SPEC, scene, inputs,
                             edits._replace(visible=jnp.array([1.0, 0.0, 1.0])))
        # hidden layer contributes nothing
        np.testing.assert_allclose(np.asarray(hidden.fine_layers.acc[1]), 0.0, atol=1e-6)
        # mixed composite actually changed for rays that hit layer 1
        hit1 = np.asarray(base.hit[1])
        assert hit1.any()
        diff = np.abs(np.asarray(base.fine.color) - np.asarray(hidden.fine.color)).sum(-1)
        assert diff[hit1].max() > 1e-5
        # background-only rays unchanged
        if (~hit1).any():
            assert diff[~hit1].max() < 1e-6

    def test_hide_background_works(self, setup):
        """Deviation-fix vs reference: hiding layer 0 takes effect
        (ref silently ignores it; modeling/layered_rfrender.py:401)."""
        params, scene, inputs = setup
        out = render(params, SPEC, scene, inputs,
                          EditState.identity(2)._replace(
                              visible=jnp.array([0.0, 0.0, 0.0])))
        np.testing.assert_allclose(np.asarray(out.fine.acc), 0.0, atol=1e-6)

    def test_shift_equivariance(self, setup):
        """Shifting a layer and the camera by the same vector reproduces the
        unshifted image of that layer (validates bbox forward transform +
        sample inverse transform; ref: layered_rfrender.py:237-243,293-298)."""
        params, scene, inputs = setup
        s = jnp.array([0.7, -0.3, 0.2])
        edits0 = EditState.identity(2)._replace(visible=jnp.array([0.0, 1.0, 0.0]))
        base = render(params, SPEC, scene, inputs, edits0)

        shift = jnp.stack([jnp.zeros(3), s, jnp.zeros(3)])
        moved_inputs = inputs._replace(rays_o=inputs.rays_o + s)
        moved = render(params, SPEC, scene, moved_inputs,
                            edits0._replace(shift=shift))
        np.testing.assert_allclose(np.asarray(moved.fine_layers.color[1]),
                                   np.asarray(base.fine_layers.color[1]),
                                   atol=2e-5)

    def test_scale_identity(self, setup):
        params, scene, inputs = setup
        pivot = compute_scale_pivot(scene.bkgd_box, np.asarray(scene.boxes[0]))
        base = render(params, SPEC, scene, inputs, EditState.identity(2))
        scaled = render(params, SPEC, scene, inputs,
                             EditState.identity(2, scale_pivot=pivot))
        np.testing.assert_allclose(np.asarray(base.fine.color),
                                   np.asarray(scaled.fine.color), atol=1e-6)

    def test_alpha_fade(self, setup):
        params, scene, inputs = setup
        edits = EditState.identity(2)._replace(alpha=jnp.array([1.0, 0.0, 1.0]))
        out = render(params, SPEC, scene, inputs, edits)
        np.testing.assert_allclose(np.asarray(out.fine_layers.acc[1]), 0.0, atol=1e-6)

    def test_deterministic_given_key(self, setup):
        params, scene, inputs = setup
        k = jax.random.PRNGKey(7)
        a = render(params, SPEC, scene, inputs, EditState.identity(2), key=k)
        b = render(params, SPEC, scene, inputs, EditState.identity(2), key=k)
        np.testing.assert_array_equal(np.asarray(a.fine.color), np.asarray(b.fine.color))

    def test_only_coarse(self, setup):
        params, scene, inputs = setup
        out = render(params, SPEC, scene, inputs, EditState.identity(2),
                          only_coarse=True)
        np.testing.assert_array_equal(np.asarray(out.fine.color),
                                      np.asarray(out.coarse.color))

    def test_grad_flows(self, setup):
        params, scene, inputs = setup

        def loss_fn(p):
            out = render(p, SPEC, scene, inputs, EditState.identity(2))
            return jnp.mean(out.fine.color**2) + jnp.mean(out.coarse.color**2)

        grads = jax.jit(jax.grad(loss_fn))(params)
        flat = jax.tree.leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
        total = sum(float(jnp.abs(g).sum()) for g in flat)
        assert total > 0.0

    def test_near_clip_removes_foreground(self, setup):
        params, scene, inputs = setup
        base = render(params, SPEC, scene, inputs, EditState.identity(2))
        clipped = render(params, SPEC, scene, inputs,
                              EditState.identity(2)._replace(near=jnp.asarray(100.0)))
        np.testing.assert_allclose(np.asarray(clipped.fine.acc), 0.0, atol=1e-6)
        assert float(base.fine.acc.max()) > 0


class TestFrameInterp:
    def test_gather_boxes_lerp(self):
        from stnerf_tpu.models.layered import _gather_boxes
        scene = make_scene(frames=3)
        f = jnp.array([[1.0, 1.0], [2.0, 2.0], [1.5, 1.5]])
        boxes = _gather_boxes(scene, f)
        np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(scene.boxes[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(boxes[1]), np.asarray(scene.boxes[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(boxes[2]),
                                   0.5 * (np.asarray(scene.boxes[0]) + np.asarray(scene.boxes[1])),
                                   atol=1e-6)


class TestRayPacking:
    def test_unpack_single_frame_col(self):
        rays = np.concatenate([np.zeros((4, 3)), np.ones((4, 3)),
                               np.full((4, 1), 5.0)], axis=1).astype(np.float32)
        inp = unpack_rays(rays, SPEC)
        assert inp.frame_ids.shape == (4, 3)
        np.testing.assert_allclose(np.asarray(inp.frame_ids), 5.0)

    def test_unpack_retiming_cols(self):
        rays = np.concatenate([np.zeros((4, 3)), np.ones((4, 3)),
                               np.tile([[2.0, 3.0, 4.0]], (4, 1))], axis=1).astype(np.float32)
        inp = unpack_rays(rays, SPEC)
        np.testing.assert_allclose(np.asarray(inp.frame_ids[0]), [2.0, 3.0, 4.0])

    def test_unpack_bad_width(self):
        with pytest.raises(ValueError):
            unpack_rays(np.zeros((4, 11), np.float32), SPEC)


class TestPoseRefinementRayPacking:
    """pose_refinement's 8-wide [o, cam, d, cam] prefix must compose with
    the deform/space-time id columns (the reference supports the combo:
    ref ray_dataset.py:407-418 appends flag columns after the prefix)."""

    @pytest.mark.parametrize("use_deform_view,use_time", [
        (False, False), (True, False), (False, True), (True, True)])
    def test_roundtrip(self, use_deform_view, use_time):
        import dataclasses

        from stnerf_tpu.models.rays import pack_rays

        spec = dataclasses.replace(SPEC, pose_refinement=True, camera_num=4,
                                   use_deform_view=use_deform_view,
                                   use_deform_time=use_time,
                                   use_space_time=use_time)
        n = 6
        rng = np.random.default_rng(0)
        inp = RayInputs(
            rays_o=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            rays_d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            frame_ids=jnp.asarray(
                np.tile(rng.integers(1, 4, size=(n, 1)), (1, 3)).astype(np.float32)),
            cam_ids=jnp.asarray(rng.integers(0, 4, size=(n,)).astype(np.float32)),
            near_far=jnp.tile(jnp.array([[0.5, 12.0]], jnp.float32), (n, 1)))

        packed = pack_rays(inp, spec)
        width = 8 + (1 if use_deform_view else 0) + (1 if use_time else 0)
        assert packed.shape == (n, width)
        # the prefix carries the camera id at columns 3 and 7
        np.testing.assert_array_equal(packed[:, 3], np.asarray(inp.cam_ids))
        np.testing.assert_array_equal(packed[:, 7], np.asarray(inp.cam_ids))

        out = unpack_rays(packed, spec, np.asarray(inp.near_far))
        np.testing.assert_allclose(np.asarray(out.rays_o), np.asarray(inp.rays_o))
        np.testing.assert_allclose(np.asarray(out.rays_d), np.asarray(inp.rays_d))
        np.testing.assert_array_equal(np.asarray(out.cam_ids), np.asarray(inp.cam_ids))
        if use_time:
            np.testing.assert_array_equal(np.asarray(out.frame_ids),
                                          np.asarray(inp.frame_ids))

    def test_matches_raygen_layout(self):
        """unpack must decode exactly what data.raygen._append_id_columns
        writes for pose_refinement + deform_view + time."""
        import dataclasses

        from stnerf_tpu.data.raygen import _append_id_columns

        spec = dataclasses.replace(SPEC, pose_refinement=True, camera_num=8,
                                   use_deform_view=True)
        base = np.arange(24, dtype=np.float32).reshape(4, 6)
        packed = _append_id_columns(base, cam_id=5, frame_id=2, spec=spec)
        out = unpack_rays(packed, spec)
        np.testing.assert_allclose(np.asarray(out.rays_o), base[:, :3])
        np.testing.assert_allclose(np.asarray(out.rays_d), base[:, 3:6])
        np.testing.assert_array_equal(np.asarray(out.cam_ids), 5.0)
        np.testing.assert_array_equal(np.asarray(out.frame_ids), 2.0)


class TestFastFine:
    """Opacity-driven fast fine render path (TPU.FAST_FINE): the fine nets
    evaluate only the new importance samples and coarse positions carry the
    coarse nets' outputs. Exact when fine nets equal coarse nets; the
    reference's full union re-evaluation (ref: modeling/layered_rfrender.py:
    481-606) stays the golden path (fast_fine=False, default)."""

    def _shared_net_setup(self):
        import dataclasses

        spec = dataclasses.replace(SPEC, same_spacenet=True,
                                   fast_fine=True, fine_skip_eps=0.0)
        params = init_layered_params(jax.random.PRNGKey(3), spec)
        # same_spacenet shares performer nets; share the background too so
        # fast and exact evaluate the *same function* at the same positions
        params = dict(params, bkgd_fine=params["bkgd_coarse"])
        return spec, params

    def test_exact_when_fine_nets_equal_coarse_nets(self):
        import dataclasses

        spec, params = self._shared_net_setup()
        exact_spec = dataclasses.replace(spec, fast_fine=False)
        scene, inputs = make_scene(), make_rays()
        key = jax.random.PRNGKey(7)
        fast = render(params, spec, scene, inputs, EditState.identity(2), key=key)
        exact = render(params, exact_spec, scene, inputs,
                       EditState.identity(2), key=key)
        np.testing.assert_allclose(np.asarray(fast.fine.color),
                                   np.asarray(exact.fine.color), atol=1e-5)
        np.testing.assert_allclose(np.asarray(fast.fine.depth),
                                   np.asarray(exact.fine.depth), atol=1e-4)
        np.testing.assert_allclose(np.asarray(fast.fine_layers.acc),
                                   np.asarray(exact.fine_layers.acc), atol=1e-5)
        # the coarse stage is untouched by the flag
        np.testing.assert_array_equal(np.asarray(fast.coarse.color),
                                      np.asarray(exact.coarse.color))

    def test_fast_fine_respects_edits_and_ranges(self):
        import dataclasses

        spec = dataclasses.replace(SPEC, fast_fine=True)
        params = init_layered_params(jax.random.PRNGKey(0), spec)
        scene, inputs = make_scene(), make_rays()
        out = render(params, spec, scene, inputs, EditState.identity(2),
                     key=jax.random.PRNGKey(1))
        for leaf in jax.tree.leaves(out):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        assert float(out.fine.acc.min()) >= 0.0
        assert float(out.fine.acc.max()) <= 1.0 + 1e-4
        # hiding a layer still removes it entirely
        hide = EditState.identity(2)
        hide = hide._replace(visible=hide.visible.at[1].set(0.0))
        h = render(params, spec, scene, inputs, hide, key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(h.fine_layers.acc[1]), 0.0,
                                   atol=1e-6)

    def test_fast_fine_nosort_matches_sorted_values_and_grads(self):
        """The fast-fine TRAINING variant (nosort_composite: carried-coarse
        + new streams composited sort-free) must match the sorted fast-fine
        path in values and parameter gradients — it is the same function,
        differently associated."""
        import dataclasses

        spec = dataclasses.replace(SPEC, fast_fine=True, fine_skip_eps=0.0)
        spec_ns = dataclasses.replace(spec, nosort_composite=True)
        params = init_layered_params(jax.random.PRNGKey(5), spec)
        scene, inputs = make_scene(), make_rays()
        key = jax.random.PRNGKey(9)
        # deterministic sampling (key=None) so both variants evaluate the
        # SAME positions: with a key, the nosort branch pre-sorts the
        # unsorted sample_pdf draws (same set, same union — but fold-order
        # inside sample_pdf's gather differs at f32 ulp scale)
        a = render(params, spec, scene, inputs, EditState.identity(2),
                   key=None)
        b = render(params, spec_ns, scene, inputs, EditState.identity(2),
                   key=None)
        np.testing.assert_allclose(np.asarray(b.fine.color),
                                   np.asarray(a.fine.color), atol=2e-5)
        np.testing.assert_allclose(np.asarray(b.fine.depth),
                                   np.asarray(a.fine.depth), atol=1e-4)
        np.testing.assert_allclose(np.asarray(b.fine_layers.acc),
                                   np.asarray(a.fine_layers.acc), atol=2e-5)
        np.testing.assert_allclose(np.asarray(b.fine_layers.color),
                                   np.asarray(a.fine_layers.color), atol=2e-5)

        def loss(p, s):
            out = render_rays(p, s, scene, inputs, EditState.identity(2),
                              key=None)
            return (jnp.sum(out.fine.color ** 2)
                    + jnp.sum(out.fine_layers.acc)
                    + jnp.sum(out.fine.depth * 1e-3))

        from jax.flatten_util import ravel_pytree

        ga = jax.grad(loss)(params, spec)
        gb = jax.grad(loss)(params, spec_ns)
        flat_a, _ = ravel_pytree(ga)
        flat_b, _ = ravel_pytree(gb)
        np.testing.assert_allclose(np.asarray(flat_b), np.asarray(flat_a),
                                   rtol=1e-3, atol=1e-5)

    def test_trainer_keeps_fast_fine_when_opted_in(self):
        import dataclasses

        from stnerf_tpu.config import get_cfg
        from stnerf_tpu.engine import make_optimizer, make_train_step

        cfg = get_cfg()
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000
        spec = dataclasses.replace(SPEC, fast_fine=True,
                                   fast_fine_train=True)
        step = make_train_step(spec, make_optimizer(cfg))
        cells = {c.cell_contents.fast_fine
                 for c in step.__wrapped__.__closure__ or ()
                 if isinstance(c.cell_contents, LayeredSpec)}
        assert cells == {True}

    def test_from_cfg_plumbs_fast_fine_train(self):
        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.TPU.FAST_FINE_TRAIN = True
        spec = LayeredSpec.from_cfg(cfg)
        assert spec.fast_fine_train

    def test_from_cfg_plumbs_compositor_kernel(self):
        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        assert not LayeredSpec.from_cfg(cfg).compositor_kernel  # default off
        cfg.TPU.COMPOSITOR_KERNEL = True
        assert LayeredSpec.from_cfg(cfg).compositor_kernel

    def test_trainer_forces_exact_path(self):
        import dataclasses

        from stnerf_tpu.engine import make_optimizer, make_train_step
        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000
        spec = dataclasses.replace(SPEC, fast_fine=True)
        step = make_train_step(spec, make_optimizer(cfg))
        # the captured spec must have fast_fine stripped; cheapest proof is
        # the closure's spec object itself
        cells = {c.cell_contents.fast_fine
                 for c in step.__wrapped__.__closure__ or ()
                 if isinstance(c.cell_contents, LayeredSpec)}
        assert cells == {False}

    def test_from_cfg_plumbs_fast_fine(self):
        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.TPU.FAST_FINE = True
        cfg.TPU.FAST_FINE_EPS = 5e-3
        spec = LayeredSpec.from_cfg(cfg)
        assert spec.fast_fine and spec.fine_skip_eps == 5e-3


class TestCoarseEarlyExit:
    """Transmittance-driven early exit in the coarse march
    (TPU.EARLY_EXIT_SEGMENTS, inference-only): the S1 samples run
    front-to-back in N sequential dispatches and a layer whose own
    transmittance saturated below EARLY_EXIT_EPS on a ray skips it for the
    remaining segments. The single-dispatch march (the reference semantics,
    ref: modeling/layered_rfrender.py:382-413) stays the golden path."""

    def test_segmented_march_matches_exact_on_xla_path(self):
        """Plumbing correctness: the XLA field path evaluates every sample
        regardless of the keep flags (they only gate kernel tiles), so the
        segmented march must reproduce the single dispatch exactly for any
        eps — same samples, same math, concatenated."""
        import dataclasses

        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        scene, inputs = make_scene(), make_rays()
        key = jax.random.PRNGKey(11)
        exact = render(params, SPEC, scene, inputs, EditState.identity(2),
                       key=key)
        for eps in (0.0, 1e-3, 0.5):
            spec = dataclasses.replace(SPEC, coarse_exit_segments=3,
                                       coarse_exit_eps=eps)
            seg = render(params, spec, scene, inputs, EditState.identity(2),
                         key=key)
            for a, b in zip(jax.tree.leaves(exact), jax.tree.leaves(seg)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           atol=1e-6)

    def test_skip_error_bounded_on_kernel_path(self, monkeypatch):
        """On the fused kernel path (interpret mode) the skip is real:
        with densities biased high every layer's transmittance saturates
        within the first segment, later segments' tiles are skipped, and
        the outputs must differ from the exact march by at most ~eps per
        layer (a skipped sample's compositing weight is below the layer's
        saturated transmittance)."""
        import dataclasses

        from stnerf_tpu.kernels import fused_field as ff_mod
        from stnerf_tpu.models import layered as layered_mod

        orig = ff_mod.fused_field
        monkeypatch.setattr(
            ff_mod, "fused_field",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        monkeypatch.setattr(layered_mod, "_use_fused_kernel", lambda s: True)

        eps = 1e-3
        spec = dataclasses.replace(SPEC, coarse_exit_segments=4,
                                   coarse_exit_eps=eps, use_pallas=True)
        exact_spec = dataclasses.replace(spec, coarse_exit_segments=0)
        params = init_layered_params(jax.random.PRNGKey(2), spec)
        # bias density so the background transmittance crosses eps midway
        # through the march (bias +1.5 * delta ~1.4 => logT ~ -2.1/sample:
        # saturation at sample ~4 of 8). A much larger bias saturates so
        # hard the skipped samples' true contribution falls below the f32
        # resolution of the color sum and the diff reads exactly 0.
        for k in ("layers_coarse", "layers_fine", "bkgd_coarse", "bkgd_fine"):
            params[k]["density"][0]["b"] = params[k]["density"][0]["b"] + 1.5
        scene, inputs = make_scene(), make_rays()
        key = jax.random.PRNGKey(5)
        # jit fresh (monkeypatched callee must not hit render's jit cache)
        run = jax.jit(render_rays, static_argnames=("spec", "only_coarse"))
        fast = run(params, spec, scene, inputs, EditState.identity(2), key=key)
        exact = run(params, exact_spec, scene, inputs, EditState.identity(2),
                    key=key)
        d_color = np.abs(np.asarray(fast.coarse.color)
                         - np.asarray(exact.coarse.color))
        d_acc = np.abs(np.asarray(fast.coarse_layers.acc)
                       - np.asarray(exact.coarse_layers.acc))
        # the skip engaged (saturated tails were not evaluated; their true
        # contribution at the eps boundary is ~1e-4, well above f32 ulp)
        assert d_color.max() > 1e-6 or d_acc.max() > 1e-6
        # ...and the error is bounded by ~(L+1) * eps
        assert d_color.max() < 4 * eps
        assert d_acc.max() < 4 * eps
        for leaf in jax.tree.leaves(fast):
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_trainer_strips_early_exit(self):
        import dataclasses

        from stnerf_tpu.config import get_cfg
        from stnerf_tpu.engine import make_optimizer, make_train_step

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000
        spec = dataclasses.replace(SPEC, coarse_exit_segments=3)
        step = make_train_step(spec, make_optimizer(cfg))
        cells = {c.cell_contents.coarse_exit_segments
                 for c in step.__wrapped__.__closure__ or ()
                 if isinstance(c.cell_contents, LayeredSpec)}
        assert cells == {0}

    def test_from_cfg_plumbs_early_exit(self):
        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        # production default (round 5): fast path on, gated at checkpoint
        # load by the renderer's fidelity probe (TPU.FIDELITY_GATE)
        assert LayeredSpec.from_cfg(cfg).coarse_exit_segments == 3
        assert LayeredSpec.from_cfg(cfg).fast_fine
        cfg.TPU.EARLY_EXIT_SEGMENTS = 4
        cfg.TPU.EARLY_EXIT_EPS = 2e-3
        spec = LayeredSpec.from_cfg(cfg)
        assert spec.coarse_exit_segments == 4
        assert spec.coarse_exit_eps == 2e-3
        cfg2 = get_cfg()
        cfg2.TPU.EARLY_EXIT_SEGMENTS = 0
        cfg2.TPU.FAST_FINE = False
        spec2 = LayeredSpec.from_cfg(cfg2)
        assert spec2.coarse_exit_segments == 0 and not spec2.fast_fine


@pytest.mark.isolate   # ~5 extra full-render programs: the main pytest
# process segfaults in XLA compile past a program-count threshold
# (round-5 finding: torch-free this time; tests/conftest.py docstring)
class TestLayerOutputSelection:
    """render_rays(layer_outputs=...): unselected layers' fine composites are
    skipped inside the device program and come back as zero images, while the
    merged pixel and every coarse output are untouched (the shared field
    evaluations still run; only per-layer compositing work drops)."""

    @pytest.mark.parametrize("variant", ["sorted", "fastfine-nosort"])
    def test_subset_matches_full(self, setup, variant):
        import dataclasses

        params, scene, inputs = setup
        spec = SPEC if variant == "sorted" else dataclasses.replace(
            SPEC, fast_fine=True, nosort_composite=True)
        key = jax.random.PRNGKey(3)
        full = render(params, spec, scene, inputs, EditState.identity(2),
                      key=key)
        sub = render(params, spec, scene, inputs, EditState.identity(2),
                     key=key, layer_outputs=(1,))
        np.testing.assert_allclose(sub.fine.color, full.fine.color, atol=1e-6)
        np.testing.assert_allclose(sub.fine.depth, full.fine.depth, atol=1e-6)
        np.testing.assert_array_equal(sub.coarse.color, full.coarse.color)
        np.testing.assert_array_equal(sub.coarse_layers.color,
                                      full.coarse_layers.color)
        np.testing.assert_allclose(sub.fine_layers.color[1],
                                   full.fine_layers.color[1], atol=1e-6)
        np.testing.assert_allclose(sub.fine_layers.acc[1],
                                   full.fine_layers.acc[1], atol=1e-6)
        for l in (0, 2):
            assert not np.asarray(sub.fine_layers.color[l]).any()
            assert not np.asarray(sub.fine_layers.depth[l]).any()
            assert not np.asarray(sub.fine_layers.acc[l]).any()

    def test_empty_and_full_selection(self, setup):
        params, scene, inputs = setup
        key = jax.random.PRNGKey(3)
        full = render(params, SPEC, scene, inputs, EditState.identity(2),
                      key=key)
        # full-range tuple normalizes to "all" (same cache entry semantics)
        allsel = render(params, SPEC, scene, inputs, EditState.identity(2),
                        key=key, layer_outputs=(0, 1, 2))
        np.testing.assert_array_equal(allsel.fine_layers.color,
                                      full.fine_layers.color)
        none = render(params, SPEC, scene, inputs, EditState.identity(2),
                      key=key, layer_outputs=())
        np.testing.assert_allclose(none.fine.color, full.fine.color,
                                   atol=1e-6)
        assert not np.asarray(none.fine_layers.color).any()
        assert not np.asarray(none.fine_layers.acc).any()
