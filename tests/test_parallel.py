"""Multi-device sharding tests on the 8-virtual-CPU mesh: mesh construction,
sharded training step (data-parallel + layer-parallel), and sharded chunked
rendering agreeing with single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stnerf_tpu.engine import make_optimizer, make_train_step
from stnerf_tpu.engine.trainer import TrainBatch
from stnerf_tpu.models import EditState, init_layered_params, render_rays
from stnerf_tpu.parallel import (DATA_AXIS, MODEL_AXIS, make_mesh,
                                 pad_for_mesh, replicate, shard_params,
                                 shard_ray_batch)
from tests.test_layered import SPEC, make_rays, make_scene

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


class TestMesh:
    def test_shapes(self):
        m = make_mesh()
        assert m.shape[DATA_AXIS] == 8 and m.shape[MODEL_AXIS] == 1
        m2 = make_mesh(model_parallel=2)
        assert m2.shape[DATA_AXIS] == 4 and m2.shape[MODEL_AXIS] == 2

    def test_pad_for_mesh(self):
        m = make_mesh()
        assert pad_for_mesh(10, m) == 16
        assert pad_for_mesh(16, m) == 16
        assert pad_for_mesh(17, m, chunk=4) == 32

    def test_shard_params_layer_axis(self):
        m = make_mesh(model_parallel=2)
        params = shard_params(m, init_layered_params(jax.random.PRNGKey(0), SPEC))
        leaf = jax.tree.leaves(params["layers_coarse"])[0]
        assert MODEL_AXIS in str(leaf.sharding.spec) or leaf.sharding.spec[0] == MODEL_AXIS


class TestShardedTrainStep:
    @pytest.mark.isolate
    @pytest.mark.parametrize("model_parallel", [1, 2])
    def test_step_runs_and_matches_semantics(self, model_parallel):
        mesh = make_mesh(model_parallel=model_parallel)
        optimizer = make_optimizer(_cfg())
        step = make_train_step(SPEC, optimizer, remove_outliers=True)

        params = shard_params(mesh, init_layered_params(jax.random.PRNGKey(0), SPEC))
        scene = replicate(mesh, make_scene())
        n = 64
        batch = TrainBatch(shard_ray_batch(mesh, make_rays(n)),
                           shard_ray_batch(mesh, jnp.full((n, 3), 0.4)),
                           shard_ray_batch(mesh, jnp.zeros((n,), jnp.int32)))
        before = jax.device_get(params)  # params buffer is donated to step()
        opt_state = optimizer.init(params)
        with jax.sharding.set_mesh(mesh):
            p2, _, metrics = step(params, opt_state, scene, batch,
                                  jax.random.PRNGKey(0), jnp.asarray(1.0),
                                  only_coarse=False)
        assert np.isfinite(float(metrics.loss))
        delta = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                    for a, b in zip(jax.tree.leaves(before),
                                    jax.tree.leaves(jax.device_get(p2))))
        assert delta > 0


class TestShardedRender:
    @pytest.mark.isolate
    def test_matches_single_device(self):
        from stnerf_tpu.render.chunked import render_rays_chunked

        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        scene = make_scene()
        inputs = make_rays(48)
        edits = EditState.identity(2)

        single = render_rays_chunked(params, SPEC, scene, inputs, edits, chunk=16)
        mesh = make_mesh()
        sharded = render_rays_chunked(shard_params(mesh, params), SPEC,
                                      replicate(mesh, scene), inputs, edits,
                                      chunk=16, mesh=mesh)
        np.testing.assert_allclose(sharded.fine.color, single.fine.color,
                                   atol=1e-5)
        np.testing.assert_allclose(sharded.fine_layers.acc, single.fine_layers.acc,
                                   atol=1e-5)


def _cfg():
    from stnerf_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    return cfg


class TestGraftEntry:
    @pytest.mark.isolate
    def test_dryrun_multichip(self):
        # isolate: the fresh subprocess has no torch and no accumulated XLA
        # programs, so the big sharded-epoch compiles AND their persistent-
        # cache writes (which segfault with torch resident — round-2/3
        # finding) are safe, and the writes keep the test cache warm.
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)


class TestShardedPoseRender:
    @pytest.mark.isolate
    def test_matches_unsharded(self):
        from stnerf_tpu.render.pose_device import render_pose_host

        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        scene = make_scene()
        h, w = 16, 16
        K = np.array([[12.0, 0, 8], [0, 12, 8], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0, 0, -5]
        fids = np.array([1.0, 2.0, 1.0], np.float32)
        nf = np.array([0.5, 12.0], np.float32)
        edits = EditState.identity(2)

        base = render_pose_host(params, SPEC, scene, K, c2w, fids, nf, edits,
                                h, w, chunk=64, tile_cols=16)
        mesh = make_mesh()
        shard = render_pose_host(params, SPEC, scene, K, c2w, fids, nf, edits,
                                 h, w, chunk=64, tile_cols=16, mesh=mesh)
        np.testing.assert_allclose(shard[0], base[0], atol=1.5 / 255)
        np.testing.assert_allclose(shard[1], base[1], atol=2e-3)

        # the renderer always trims the download to shown layers — exercise
        # the gather-then-download path on sharded outputs too
        trim = render_pose_host(params, SPEC, scene, K, c2w, fids, nf, edits,
                                h, w, chunk=64, tile_cols=16, mesh=mesh,
                                download_layers=[0, 2])
        np.testing.assert_array_equal(trim[0], shard[0])
        np.testing.assert_array_equal(trim[2][0], shard[2][0])
        np.testing.assert_array_equal(trim[2][2], shard[2][2])
        assert not trim[2][1].any()


class TestShardedEpoch:
    """The production trainer path: shard_map'd scanned epoch over the data
    axis (chip-local pool gathers, pmean'd grads, replicated update)."""

    def test_shard_pool_pads_and_shards(self):
        from stnerf_tpu.engine import shard_pool
        from stnerf_tpu.engine.trainer import TrainBatch as TB

        mesh = make_mesh()
        n = 130  # not a multiple of 8
        pool = TB(make_rays(n), jnp.full((n, 3), 0.4), jnp.zeros((n,), jnp.int32))
        sharded, n_pad = shard_pool(pool, mesh)
        assert n_pad == 136
        assert sharded.rgb.shape[0] == 136
        assert str(DATA_AXIS) in str(sharded.rgb.sharding.spec)
        # padding replicates the last row
        np.testing.assert_array_equal(np.asarray(sharded.rgb[-1]),
                                      np.asarray(pool.rgb[-1]))

    @pytest.mark.isolate
    def test_compact_pool_epoch_matches_decoded(self):
        """A sharded epoch over the compact pixel pool (on-device decode,
        closure-captured camera tables inside shard_map) produces the same
        parameters as the same epoch over the pre-decoded f32 pool."""
        from stnerf_tpu.engine import shard_pool
        from stnerf_tpu.engine.trainer import (CamTables, CompactPool,
                                               make_decode, make_train_epoch)

        D, n_pool, batch, M, W = 8, 128, 32, 4, 60
        rng = np.random.default_rng(3)
        mesh = make_mesh()

        rots = []
        for _ in range(M):
            q = rng.normal(size=(3, 3))
            u, _, vt = np.linalg.svd(q)
            rots.append((u @ vt).astype(np.float32))
        tables = CamTables(
            inv_K=jnp.asarray(np.tile(np.linalg.inv(
                np.array([[50., 0, 30], [0, 50, 22.5], [0, 0, 1]],
                         np.float32))[None], (M, 1, 1))),
            rot=jnp.asarray(np.stack(rots)),
            origin=jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32) * 0.1
                               + np.array([0, 0, -5], np.float32)),
            near_far=jnp.asarray(
                rng.uniform(0.5, 12, size=(3, 4, M, 2)).astype(np.float32)))
        tables = CamTables(tables.inv_K, tables.rot, tables.origin,
                           jnp.sort(tables.near_far, axis=-1))
        pool = CompactPool(
            cams=jnp.asarray(rng.integers(0, M, n_pool).astype(np.uint16)),
            pix=jnp.asarray(rng.integers(0, W * 45, n_pool).astype(np.uint32)),
            frames=jnp.asarray(rng.integers(1, 4, n_pool).astype(np.uint16)),
            labels=jnp.asarray(rng.integers(0, 3, n_pool).astype(np.uint8)),
            bbox_labels=jnp.asarray(rng.integers(0, 3, n_pool).astype(np.uint8)),
            rgb=jnp.asarray(rng.integers(0, 256, (n_pool, 3)).astype(np.uint8)))
        decode = make_decode(tables, SPEC, W)
        decoded = jax.jit(decode)(pool)

        # host copies: donated epoch args must not alias a reused device tree
        params = jax.device_get(init_layered_params(jax.random.PRNGKey(0), SPEC))
        scene = jax.device_get(make_scene())
        ekey, mask_on = jax.random.PRNGKey(11), jnp.asarray(1.0)

        outs = []
        for p, dec in ((pool, decode), (decoded, None)):
            # fresh optimizer per run: donated epoch args must not share
            # buffers captured inside a reused optimizer's init
            optimizer = make_optimizer(_cfg())
            epoch_fn = make_train_epoch(SPEC, optimizer, remove_outliers=True,
                                        mesh=mesh, decode=dec)
            sp, _ = shard_pool(p, mesh)
            dp = replicate(mesh, jax.tree.map(jnp.asarray, params))
            p2, _, m = epoch_fn(dp, optimizer.init(dp),
                                replicate(mesh, jax.tree.map(jnp.asarray, scene)),
                                sp, ekey, mask_on,
                                batch_size=batch, steps=2, only_coarse=False)
            outs.append((jax.device_get(p2), np.asarray(m.loss)))

        np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
        for a, b in zip(jax.tree.leaves(outs[0][0]),
                        jax.tree.leaves(outs[1][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    @pytest.mark.isolate
    def test_epoch_matches_host_reconstruction(self):
        """One sharded epoch step == per-shard local gathers + mean-of-shard
        grads + one replicated optimizer update, reconstructed on host."""
        import dataclasses

        import optax

        from stnerf_tpu.engine import make_pool, shard_pool
        from stnerf_tpu.engine.trainer import (TrainBatch as TB, _losses,
                                               make_train_epoch)
        from stnerf_tpu.models import EditState

        D, n_pool, batch = 8, 128, 32
        mesh = make_mesh()
        optimizer = make_optimizer(_cfg())
        pool = TB(make_rays(n_pool), jnp.full((n_pool, 3), 0.4),
                  jnp.zeros((n_pool,), jnp.int32))
        params = jax.device_get(init_layered_params(jax.random.PRNGKey(0), SPEC))
        scene = make_scene()
        ekey = jax.random.PRNGKey(7)
        mask_on = jnp.asarray(1.0)

        spool, _ = shard_pool(pool, mesh)
        epoch_fn = make_train_epoch(SPEC, optimizer, remove_outliers=True,
                                    mesh=mesh)
        dev_params = replicate(mesh, jax.tree.map(jnp.asarray, params))
        p2, _, metrics = epoch_fn(dev_params, optimizer.init(dev_params),
                                  replicate(mesh, scene), spool, ekey, mask_on,
                                  batch_size=batch, steps=1, only_coarse=False)
        p2 = jax.device_get(p2)

        # host reconstruction of the shard_map body (steps=1)
        spec2 = dataclasses.replace(SPEC, use_pallas=False,
                                    nosort_composite=True)
        edits = EditState.identity(SPEC.layer_num)
        n_local, b_local = n_pool // D, batch // D
        key, pkey = jax.random.split(ekey)
        key, sub = jax.random.split(key)
        grads_sum = None
        losses = []
        for d in range(D):
            idx = jax.random.permutation(jax.random.fold_in(pkey, d),
                                         n_local)[:b_local]
            rows = np.asarray(idx) + d * n_local
            batch_d = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[rows]),
                                   pool)
            sub_d = jax.random.fold_in(sub, d)

            def loss_fn(p, batch_d=batch_d, sub_d=sub_d):
                return _losses(spec2, edits, True, p, scene, batch_d, sub_d,
                               mask_on, False, mask_scale=float(D))

            (l, _), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
            losses.append(float(l))
            grads_sum = g if grads_sum is None else jax.tree.map(jnp.add,
                                                                 grads_sum, g)
        grads = jax.tree.map(lambda x: x / D, grads_sum)
        opt_state = optimizer.init(params)
        updates, _ = optimizer.update(grads, opt_state, params)
        expected = jax.device_get(optax.apply_updates(params, updates))

        np.testing.assert_allclose(float(metrics.loss[0]), np.mean(losses),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(expected), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
