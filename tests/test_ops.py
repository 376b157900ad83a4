"""Golden-value tests for the core ops against independent NumPy
implementations (the reference ships no tests; strategy per SURVEY.md §4:
golden math checks + deterministic sampling modes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stnerf_tpu.ops import (MISS_T, encoding_dim, lerp_encoded_time,
                            merge_layers, positional_encoding, psnr,
                            ray_aabb_intersect, sample_pdf, ssim,
                            stratified_between, stratified_near_far,
                            volume_render)


class TestEncoding:
    def test_dim(self):
        assert encoding_dim(3, 10, True) == 63
        assert encoding_dim(3, 4, True) == 27
        assert encoding_dim(1, 10, True) == 21
        assert encoding_dim(4, 10, True) == 84
        assert encoding_dim(3, 10, False) == 60

    def test_values_and_order(self, rng):
        x = rng.normal(size=(5, 3)).astype(np.float32)
        out = np.asarray(positional_encoding(jnp.array(x), 4, True))
        # reference order: raw, then per-frequency [sin(f x), cos(f x)]
        expect = [x]
        for f in [1.0, 2.0, 4.0, 8.0]:
            expect += [np.sin(f * x), np.cos(f * x)]
        np.testing.assert_allclose(out, np.concatenate(expect, -1), rtol=1e-5, atol=1e-6)

    def test_lerp_time_integer_matches_direct(self, rng):
        xyz = rng.normal(size=(7, 3)).astype(np.float32)
        t = np.array([1, 2, 3, 4, 5, 6, 7], np.float32)
        direct = positional_encoding(jnp.concatenate([jnp.array(xyz), jnp.array(t)[:, None]], -1), 10, True)
        blended = lerp_encoded_time(jnp.array(xyz), jnp.array(t), 10, True)
        np.testing.assert_allclose(np.asarray(blended), np.asarray(direct), atol=1e-5)

    def test_lerp_time_fractional(self, rng):
        xyz = rng.normal(size=(4, 3)).astype(np.float32)
        t = np.array([1.25, 2.5, 3.75, 4.0], np.float32)
        got = np.asarray(lerp_encoded_time(jnp.array(xyz), jnp.array(t), 10, True))
        lo = np.floor(t)
        w = (t - lo)[:, None]
        e = lambda tt: np.asarray(positional_encoding(
            jnp.concatenate([jnp.array(xyz), jnp.array(tt)[:, None]], -1), 10, True))
        np.testing.assert_allclose(got, (1 - w) * e(lo) + w * e(lo + 1), atol=1e-5)


class TestAABB:
    def test_hits_and_misses(self):
        o = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, -5.0], [10.0, 10.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        bmin = jnp.full((3, 3), -1.0)
        bmax = jnp.full((3, 3), 1.0)
        tn, tf, hit = ray_aabb_intersect(o, d, bmin, bmax)
        assert bool(hit[0]) and not bool(hit[1]) and not bool(hit[2])
        np.testing.assert_allclose(tn[0], 4.0, atol=1e-5)
        np.testing.assert_allclose(tf[0], 6.0, atol=1e-5)
        assert tn[1] == MISS_T and tf[2] == MISS_T

    def test_origin_inside_box(self):
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 0.0, 1.0]])
        tn, tf, hit = ray_aabb_intersect(o, d, -jnp.ones((1, 3)), jnp.ones((1, 3)))
        assert bool(hit[0])
        np.testing.assert_allclose(tn[0], -1.0, atol=1e-5)
        np.testing.assert_allclose(tf[0], 1.0, atol=1e-5)

    def test_random_vs_bruteforce(self, rng):
        """Cross-check against an independent 6-face-plane implementation
        (the method the reference uses, layers/RaySamplePoint.py:8-62)."""
        n = 256
        o = rng.normal(size=(n, 3)).astype(np.float32) * 3
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        lo = rng.uniform(-2, 0, size=(n, 3)).astype(np.float32)
        hi = lo + rng.uniform(0.5, 3, size=(n, 3)).astype(np.float32)

        tn, tf, hit = ray_aabb_intersect(jnp.array(o), jnp.array(d), jnp.array(lo), jnp.array(hi))
        tn, tf, hit = map(np.asarray, (tn, tf, hit))

        for i in range(n):
            ts = []
            for ax in range(3):
                for face in (lo[i, ax], hi[i, ax]):
                    t = (face - o[i, ax]) / d[i, ax]
                    p = o[i] + t * d[i]
                    others = [a for a in range(3) if a != ax]
                    if all(lo[i, a] - 1e-4 <= p[a] <= hi[i, a] + 1e-4 for a in others):
                        ts.append(t)
                if len(ts) >= 2:
                    pass
            if hit[i]:
                assert len(ts) >= 2, f"ray {i} flagged hit but brute force missed"
                np.testing.assert_allclose(tn[i], min(ts), rtol=1e-3, atol=1e-3)
                np.testing.assert_allclose(tf[i], max(ts), rtol=1e-3, atol=1e-3)


class TestStratified:
    def test_between_det(self):
        t = np.asarray(stratified_between(jnp.array([0.0]), jnp.array([9.0]), 9))
        np.testing.assert_allclose(t[0], np.arange(9) + 0.5, atol=1e-5)

    def test_between_random_in_bins(self):
        key = jax.random.PRNGKey(0)
        t = np.asarray(stratified_between(jnp.array([2.0]), jnp.array([12.0]), 10, key))
        edges = 2.0 + np.arange(11)
        assert np.all(t[0] >= edges[:-1]) and np.all(t[0] <= edges[1:])

    def test_near_far_det(self):
        z = np.asarray(stratified_near_far(jnp.array([1.0]), jnp.array([5.0]), 5))
        np.testing.assert_allclose(z[0], np.linspace(1, 5, 5), atol=1e-6)

    def test_near_far_random_bounds(self):
        key = jax.random.PRNGKey(1)
        z = np.asarray(stratified_near_far(jnp.full((4,), 1.0), jnp.full((4,), 5.0), 32, key))
        assert z.min() >= 1.0 - 1e-5 and z.max() <= 5.0 + 1e-5
        assert np.all(np.diff(z, axis=-1) > -1e-5)


class TestSamplePdf:
    def test_det_uniform_weights(self):
        """Uniform weights + det mode -> inverse CDF is (near-)linear."""
        z = jnp.tile(jnp.linspace(0.0, 1.0, 11)[None], (2, 1))
        w = jnp.ones((2, 9))
        s = np.asarray(sample_pdf(z, w, 5))
        assert s.shape == (2, 5)
        assert np.all(np.diff(s, axis=-1) > 0)
        assert s.min() >= 0.05 - 1e-4 and s.max() <= 0.95 + 1e-4

    def test_concentrates_on_peak(self):
        z = jnp.tile(jnp.linspace(0.0, 1.0, 12)[None], (1, 1))
        w = np.full((1, 10), 1e-4, np.float32)
        w[0, 5] = 10.0  # peak around z ~ 0.5
        s = np.asarray(sample_pdf(z, jnp.array(w), 16, jax.random.PRNGKey(0)))
        assert np.mean(np.abs(s - z[0, 6])) < 0.15

    def test_matches_numpy_reference(self, rng):
        """Golden check vs an independent numpy inverse-CDF implementation."""
        n, s_c, s_f = 8, 16, 7
        z = np.sort(rng.uniform(0, 10, size=(n, s_c)).astype(np.float32), axis=-1)
        w = rng.uniform(0, 1, size=(n, s_c - 2)).astype(np.float32)
        got = np.asarray(sample_pdf(jnp.array(z), jnp.array(w), s_f))

        bins = 0.5 * (z[:, 1:] + z[:, :-1])
        ww = w + 1e-5
        pdf = ww / ww.sum(-1, keepdims=True)
        cdf = np.concatenate([np.zeros((n, 1), np.float32), np.cumsum(pdf, -1)], -1)
        u = np.broadcast_to(np.linspace(0, 1, s_f, dtype=np.float32), (n, s_f))
        expect = np.empty((n, s_f), np.float32)
        for i in range(n):
            inds = np.searchsorted(cdf[i], u[i], side="right")
            below = np.maximum(inds - 1, 0)
            above = np.minimum(inds, cdf.shape[-1] - 1)
            cb, ca = cdf[i][below], cdf[i][above]
            bmax = bins.shape[-1] - 1
            bb, ba = bins[i][np.minimum(below, bmax)], bins[i][np.minimum(above, bmax)]
            den = np.where(ca - cb < 1e-5, 1.0, ca - cb)
            expect[i] = bb + (u[i] - cb) / den * (ba - bb)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def _numpy_volume_render(t, rgb, sigma, bw=1e10):
    """Independent implementation of the reference compositor
    (alpha/exclusive-cumprod/sigmoid-in-renderer; layers/render_layer.py:8-58)."""
    delta = np.concatenate([t[:, 1:] - t[:, :-1], np.full_like(t[:, :1], bw)], -1)
    alpha = 1 - np.exp(-np.maximum(sigma, 0) * delta)
    trans = np.cumprod(np.concatenate([np.ones_like(alpha[:, :1]), 1 - alpha + 1e-10], -1), -1)[:, :-1]
    w = alpha * trans
    color = (w[..., None] / (1 + np.exp(-rgb)) * np.exp(-rgb) * 0).sum(1)  # placeholder
    color = (w[..., None] * (1 / (1 + np.exp(-rgb)))).sum(1)
    depth = (w * t).sum(-1, keepdims=True)
    acc = w.sum(-1, keepdims=True)
    return color, depth, acc, w


class TestVolumeRender:
    def test_matches_numpy(self, rng):
        n, s = 16, 24
        t = np.sort(rng.uniform(0, 8, (n, s)).astype(np.float32), -1)
        rgb = rng.normal(size=(n, s, 3)).astype(np.float32)
        sig = rng.normal(size=(n, s)).astype(np.float32)
        out = volume_render(jnp.array(t), jnp.array(rgb), jnp.array(sig))
        ec, ed, ea, ew = _numpy_volume_render(t, rgb, sig)
        np.testing.assert_allclose(np.asarray(out.color), ec, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth), ed, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.acc), ea, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights)[..., 0], ew, rtol=1e-4, atol=1e-5)

    def test_opaque_wall(self):
        """A very dense first sample should dominate the composite."""
        t = jnp.tile(jnp.linspace(1.0, 2.0, 8)[None], (1, 1))
        rgb = jnp.full((1, 8, 3), 10.0)  # sigmoid -> ~1
        sig = jnp.concatenate([jnp.full((1, 1), 1e4), jnp.zeros((1, 7))], -1)
        out = volume_render(t, rgb, sig)
        np.testing.assert_allclose(np.asarray(out.color[0]), [1, 1, 1], atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.depth[0]), [1.0], atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.acc[0]), [1.0], atol=1e-3)

    def test_empty_space(self):
        t = jnp.tile(jnp.linspace(1.0, 2.0, 8)[None], (1, 1))
        out = volume_render(t, jnp.zeros((1, 8, 3)), jnp.zeros((1, 8)))
        np.testing.assert_allclose(np.asarray(out.acc[0]), [0.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.color[0]), [0, 0, 0], atol=1e-6)


class TestMergeLayers:
    def test_sorted_union(self, rng):
        L, n, s = 3, 5, 6
        t = rng.uniform(0, 10, (L, n, s)).astype(np.float32)
        t.sort(-1)
        rgb = rng.normal(size=(L, n, s, 3)).astype(np.float32)
        sig = rng.normal(size=(L, n, s)).astype(np.float32)
        tm, rgbm, sigm = merge_layers(jnp.array(t), jnp.array(rgb), jnp.array(sig))
        tm, rgbm, sigm = map(np.asarray, (tm, rgbm, sigm))
        assert tm.shape == (n, L * s)
        assert np.all(np.diff(tm, axis=-1) >= 0)
        # every (t, sigma, rgb) tuple from the inputs appears in the output
        for i in range(n):
            order = np.argsort(np.concatenate([t[l, i] for l in range(L)]), kind="stable")
            np.testing.assert_allclose(tm[i], np.concatenate([t[l, i] for l in range(L)])[order], atol=1e-6)
            np.testing.assert_allclose(sigm[i], np.concatenate([sig[l, i] for l in range(L)])[order], atol=1e-6)
            np.testing.assert_allclose(rgbm[i], np.concatenate([rgb[l, i] for l in range(L)])[order], atol=1e-6)

    def test_merge_composite_equals_manual(self, rng):
        """Compositing the merged set == compositing a hand-sorted union."""
        L, n, s = 2, 4, 5
        t = np.sort(rng.uniform(0, 5, (L, n, s)).astype(np.float32), -1)
        rgb = rng.normal(size=(L, n, s, 3)).astype(np.float32)
        sig = rng.uniform(0, 2, size=(L, n, s)).astype(np.float32)
        tm, rgbm, sigm = merge_layers(jnp.array(t), jnp.array(rgb), jnp.array(sig))
        out = volume_render(tm, rgbm, sigm)
        tc = np.concatenate([t[l] for l in range(L)], -1)
        order = np.argsort(tc, -1)
        tc = np.take_along_axis(tc, order, -1)
        sc = np.take_along_axis(np.concatenate([sig[l] for l in range(L)], -1), order, -1)
        rc = np.take_along_axis(np.concatenate([rgb[l] for l in range(L)], 1), order[..., None], 1)
        ec, _, _, _ = _numpy_volume_render(tc, rc, sc)
        np.testing.assert_allclose(np.asarray(out.color), ec, rtol=1e-4, atol=1e-5)


class TestMetrics:
    def test_psnr(self):
        a = jnp.zeros((4, 4, 3))
        b = jnp.full((4, 4, 3), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)

    def test_ssim_identity(self, rng):
        img = jnp.array(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
        noisy = img + 0.3 * jnp.array(rng.normal(size=(16, 16, 3)).astype(np.float32))
        assert float(ssim(img, noisy)) < 0.9


def test_recursive_encoding_matches_exact():
    """Double-angle-recursion trig (TPU hot path) vs the exact encoder."""
    import jax.numpy as jnp

    from stnerf_tpu.ops.encoding import positional_encoding_planar

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-20, 20, size=(4, 500)).astype(np.float32))
    exact = positional_encoding_planar(x, 10, True)
    rec = positional_encoding_planar(x, 10, True, recursive=True)
    # recursion error compounds ~2x/octave from f32 sin/cos; the invariant
    # that matters is staying under the bf16 lsb (~4e-3) of the compute path
    np.testing.assert_allclose(np.asarray(rec), np.asarray(exact),
                               atol=2e-3, rtol=0)


def test_nosort_composite_matches_sorted_path():
    """Training compositor (sort-free factorized transmittance) vs
    merge_layers_planar + volume_render_planar: values AND gradients."""
    import jax
    import jax.numpy as jnp

    from stnerf_tpu.ops.volume import (composite_merged_nosort,
                                       merge_layers_planar,
                                       volume_render_planar)

    L, N, S = 3, 64, 24
    rng = np.random.default_rng(7)
    t = jnp.asarray(np.sort(rng.uniform(0.5, 16, size=(L, N, S))
                            .astype(np.float32), axis=-1))
    # degenerate rows: a "missed" layer with all-zero depths and densities
    t = t.at[1, :8].set(0.0)
    rgb = jnp.asarray(rng.normal(size=(L, 3, N, S)).astype(np.float32))
    sig = jnp.asarray(rng.normal(size=(L, N, S)).astype(np.float32))
    sig = sig.at[1, :8].set(0.0)

    def sorted_loss(rgb, sig, reduce=True):
        out = volume_render_planar(*merge_layers_planar(t, rgb, sig), 1e10)
        return (jnp.sum(out.color ** 2) + jnp.sum(out.acc)
                + jnp.sum(out.depth)) if reduce else out

    def nosort_loss(rgb, sig, reduce=True):
        out = composite_merged_nosort(t, rgb, sig, 1e10)
        return (jnp.sum(out.color ** 2) + jnp.sum(out.acc)
                + jnp.sum(out.depth)) if reduce else out

    ref = sorted_loss(rgb, sig, reduce=False)
    new = nosort_loss(rgb, sig, reduce=False)
    np.testing.assert_allclose(np.asarray(new.color), np.asarray(ref.color),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new.depth), np.asarray(ref.depth),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new.acc), np.asarray(ref.acc),
                               rtol=1e-5, atol=1e-6)

    gr_ref, gs_ref = jax.grad(sorted_loss, (0, 1))(rgb, sig)
    gr_new, gs_new = jax.grad(nosort_loss, (0, 1))(rgb, sig)
    np.testing.assert_allclose(np.asarray(gr_new), np.asarray(gr_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs_new), np.asarray(gs_ref),
                               rtol=1e-4, atol=1e-5)


def test_cumprod_closed_form_backward_matches_autodiff():
    """The compositors' transmittance cumprod carries a closed-form VJP
    (valid because factors are bounded below by 1e-10 — ops/volume.py
    ``_cumprod_bounded``); its gradients must equal differentiating the
    stock ``jnp.cumprod`` prefix network, including at saturated samples.
    Runs under jit: XLA const-folds the source-level ``+ 1e-10`` away
    (reassociation), so compiled saturated factors are EXACT zeros — the
    closed form must stay finite there (it clamps its divide)."""
    import jax
    import jax.numpy as jnp

    from stnerf_tpu.ops.volume import render_weights

    def weights_stock(sigma, delta):
        alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * delta)
        f = 1.0 - alpha + 1e-10
        trans = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(f[:, :1]), f], -1), -1)[:, :-1]
        return alpha * trans

    rng = np.random.default_rng(3)
    sigma = np.asarray(rng.normal(size=(32, 48)), np.float32)
    sigma[:4, 5] = 1e6          # opaque sample: factor hits the 1e-10 floor
    sigma = jnp.asarray(sigma)
    delta = jnp.asarray(rng.uniform(0.01, 0.2, size=(32, 48))
                        .astype(np.float32))
    g = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))

    def loss(wfn):
        return lambda s, d: jnp.sum(wfn(s, d) * g)

    np.testing.assert_allclose(np.asarray(jax.jit(render_weights)(sigma, delta)),
                               np.asarray(jax.jit(weights_stock)(sigma, delta)),
                               rtol=1e-6, atol=1e-7)
    for arg in (0, 1):
        ga = jax.jit(jax.grad(loss(weights_stock), arg))(sigma, delta)
        gb = jax.jit(jax.grad(loss(render_weights), arg))(sigma, delta)
        assert np.isfinite(np.asarray(gb)).all()
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=1e-4, atol=1e-6)


def test_ssim_bounded_on_smooth_images():
    """SSIM regression guard: smooth (low-variance-window) images exercise
    the catastrophic cancellation in the variance terms that made TPU bf16
    convs return SSIM values far outside [-1, 1] (fixed with
    precision=HIGHEST in the conv)."""
    import jax.numpy as jnp

    from stnerf_tpu.ops.metrics import ssim

    h, w = 120, 160
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    gt = np.stack([xx, yy, 0.5 * (xx + yy)], -1).astype(np.float32)
    rng = np.random.default_rng(0)
    pred = np.clip(gt + rng.normal(scale=0.02, size=gt.shape), 0, 1).astype(np.float32)
    s = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
    assert -1.0 <= s <= 1.0
    assert s > 0.5  # structurally similar


def test_stream_compositor_heterogeneous_lengths():
    """composite_streams_nosort with UNEQUAL stream lengths vs sorting the
    union with a constant permutation: values AND gradients. This is the
    fast-fine training compositor's exact use (a carried-coarse stream and
    a shorter importance stream per layer, ref union semantics:
    modeling/layered_rfrender.py:462)."""
    import jax
    import jax.numpy as jnp

    from stnerf_tpu.ops.volume import (composite_streams_nosort,
                                       volume_render_planar)

    lengths, N = [24, 9, 17], 32
    rng = np.random.default_rng(11)
    ts = [jnp.asarray(np.sort(rng.uniform(0.5, 16, size=(N, S))
                              .astype(np.float32), axis=-1))
          for S in lengths]
    rgbs = [jnp.asarray(rng.normal(size=(3, N, S)).astype(np.float32))
            for S in lengths]
    sigs = [jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))
            for S in lengths]
    order = jnp.asarray(
        np.argsort(np.concatenate([np.asarray(t) for t in ts], -1), axis=-1))

    def ref_loss(rgbs, sigs, reduce=True):
        t_cat = jnp.concatenate(ts, -1)
        r_cat = jnp.concatenate(rgbs, -1)
        s_cat = jnp.concatenate(sigs, -1)
        t_s = jnp.take_along_axis(t_cat, order, -1)
        r_s = jnp.take_along_axis(r_cat, order[None], -1)
        s_s = jnp.take_along_axis(s_cat, order, -1)
        out = volume_render_planar(t_s, r_s, s_s, 1e10)
        return (jnp.sum(out.color ** 2) + jnp.sum(out.acc)
                + jnp.sum(out.depth)) if reduce else out

    def stream_loss(rgbs, sigs, reduce=True):
        out = composite_streams_nosort(list(zip(ts, rgbs, sigs)), 1e10)
        return (jnp.sum(out.color ** 2) + jnp.sum(out.acc)
                + jnp.sum(out.depth)) if reduce else out

    ref = ref_loss(rgbs, sigs, reduce=False)
    new = stream_loss(rgbs, sigs, reduce=False)
    np.testing.assert_allclose(np.asarray(new.color), np.asarray(ref.color),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new.depth), np.asarray(ref.depth),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new.acc), np.asarray(ref.acc),
                               rtol=1e-5, atol=1e-6)

    gr_ref, gs_ref = jax.grad(ref_loss, (0, 1))(rgbs, sigs)
    gr_new, gs_new = jax.grad(stream_loss, (0, 1))(rgbs, sigs)
    for a, b in zip(gr_new, gr_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(gs_new, gs_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_stream_compositor_cubes_are_rematerialized():
    """VERDICT r3 #7: composite_streams_nosort must NOT keep the M*(M-1)
    (N, S_a, S_b) precedence cubes as backward residuals (quadratic in S —
    ~0.35 GB at M=3, N=2000, S=120). The cross-stream contraction is
    jax.checkpoint'ed, so the linearized computation's residuals must all
    be O(N * S): assert the remat primitive is present and no residual
    carried from forward to backward is cube-sized."""
    import jax
    import jax.numpy as jnp

    from stnerf_tpu.ops.volume import composite_streams_nosort

    lengths, N = [40, 40, 40], 16
    rng = np.random.default_rng(2)
    ts = [jnp.asarray(np.sort(rng.uniform(0.5, 16, size=(N, S))
                              .astype(np.float32), -1)) for S in lengths]
    rgbs = [jnp.asarray(rng.normal(size=(3, N, S)).astype(np.float32))
            for S in lengths]
    sigs = [jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))
            for S in lengths]

    def loss(rgbs, sigs):
        out = composite_streams_nosort(list(zip(ts, rgbs, sigs)), 1e10)
        return jnp.sum(out.color ** 2) + jnp.sum(out.acc)

    jaxpr = jax.make_jaxpr(jax.grad(loss, (0, 1)))(rgbs, sigs)
    flat = jaxpr.jaxpr
    assert any("remat" in eqn.primitive.name for eqn in flat.eqns), \
        [e.primitive.name for e in flat.eqns]

    # residuals = outputs of non-remat forward eqns consumed after the remat
    # eqn (the backward). None may have S*S trailing elements.
    remat_pos = max(i for i, e in enumerate(flat.eqns)
                    if "remat" in e.primitive.name)
    cube_elems = lengths[0] * lengths[1]
    produced_before = {}
    for i, eqn in enumerate(flat.eqns[:remat_pos]):
        for v in eqn.outvars:
            produced_before[id(v)] = v
    for eqn in flat.eqns[remat_pos + 1:]:
        for v in eqn.invars:
            aval = getattr(v, "aval", None)
            if aval is None or id(v) not in produced_before:
                continue
            assert np.prod(aval.shape or (1,)) < N * cube_elems, \
                (eqn.primitive.name, aval.shape)


def test_compositor_kernel_matches_xla_cubes():
    """composite_merged_nosort(kernel=True) — the Pallas cross-transmittance
    path (kernels/cross_trans.py, interpret mode here) — must match the XLA
    einsum-cube path in values AND gradients, including cross-layer depth
    TIES (stable stream order: <= for a<b, < for a>b) and saturated
    densities (the 1e-10 log floor)."""
    import jax
    import jax.numpy as jnp

    from stnerf_tpu.ops.volume import composite_merged_nosort

    L, N, S = 3, 37, 24  # N deliberately not a multiple of the ray block
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0.5, 16, size=(L, N, S)).astype(np.float32), -1)
    t[1, :5, 3:7] = t[0, :5, 3:7]       # exact cross-layer ties
    t[2, :5, 10] = t[0, :5, 10]
    t = jnp.asarray(t)
    sig = np.asarray(rng.normal(size=(L, N, S)), np.float32)
    sig[0, :3, 4] = 1e6                 # saturated: exact-zero factor
    sig = jnp.asarray(sig)
    rgb = jnp.asarray(rng.normal(size=(L, 3, N, S)).astype(np.float32))

    def loss(fn):
        def f(rgb, sig, reduce=True):
            out = fn(rgb, sig)
            return (jnp.sum(out.color ** 2) + jnp.sum(out.acc)
                    + jnp.sum(out.depth)
                    + jnp.sum(out.weights ** 2)) if reduce else out
        return f

    xla = loss(lambda r, s: composite_merged_nosort(t, r, s, 1e10))
    ker = loss(lambda r, s: composite_merged_nosort(
        t, r, s, 1e10, kernel=True, interpret=True))

    a, b = xla(rgb, sig, reduce=False), ker(rgb, sig, reduce=False)
    for name in ("color", "depth", "acc", "weights"):
        np.testing.assert_allclose(np.asarray(getattr(b, name)),
                                   np.asarray(getattr(a, name)),
                                   rtol=1e-5, atol=1e-6, err_msg=name)

    gr_a, gs_a = jax.grad(xla, (0, 1))(rgb, sig)
    gr_b, gs_b = jax.grad(ker, (0, 1))(rgb, sig)
    assert np.isfinite(np.asarray(gs_b)).all()
    np.testing.assert_allclose(np.asarray(gr_b), np.asarray(gr_a),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs_b), np.asarray(gs_a),
                               rtol=1e-4, atol=1e-5)
