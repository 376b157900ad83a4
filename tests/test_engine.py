"""Engine tests: LR schedule, losses, checkpointing, and a short training
run on a tiny model that must reduce the loss."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stnerf_tpu.engine import (latest_checkpoint, load_checkpoint,
                               make_lr_schedule, make_optimizer,
                               make_train_step, mask_alpha_loss,
                               save_checkpoint)
from stnerf_tpu.engine.trainer import TrainBatch
from stnerf_tpu.models import EditState, init_layered_params
from tests.test_layered import SPEC, make_rays, make_scene


class TestLrSchedule:
    def test_reference_shape(self):
        # ref: solver/lr_scheduler.py:59-69
        s = make_lr_schedule(1.0, warmup_iters=10, start_iters=100,
                             end_iters=200, lr_scale=0.1)
        assert float(s(0)) == pytest.approx(0.1)       # (0+1)/10
        assert float(s(9)) == pytest.approx(1.0)       # end of warmup
        assert float(s(50)) == pytest.approx(1.0)      # plateau
        assert float(s(99)) == pytest.approx(0.9 * np.exp(0) + 0.1)
        assert float(s(199)) == pytest.approx(0.9 * np.exp(-1) + 0.1, rel=1e-3)
        # floor
        assert float(s(10_000)) == pytest.approx(0.1, abs=1e-3)

    def test_warmup_multistep_matches_bisect(self):
        # ref: solver/lr_scheduler.py:12-55
        from bisect import bisect_right

        from stnerf_tpu.engine import make_warmup_multistep

        milestones = [30, 60, 90]
        s = make_warmup_multistep(2.0, milestones, gamma=0.1,
                                  warmup_factor=1.0 / 3, warmup_iters=10)
        for step in [0, 1, 5, 9, 10, 29, 30, 31, 59, 60, 90, 91, 500]:
            wf = 1.0
            if step < 10:
                alpha = step / 10
                wf = (1.0 / 3) * (1 - alpha) + alpha
            expected = 2.0 * wf * 0.1 ** bisect_right(milestones, step)
            assert float(s(step)) == pytest.approx(expected, rel=1e-5), step
        # constant warmup variant
        sc = make_warmup_multistep(1.0, [20], warmup_method="constant",
                                   warmup_factor=0.25, warmup_iters=5)
        assert float(sc(0)) == pytest.approx(0.25)
        assert float(sc(4)) == pytest.approx(0.25)
        assert float(sc(5)) == pytest.approx(1.0)
        assert float(sc(20)) == pytest.approx(0.1)
        with pytest.raises(ValueError):
            make_warmup_multistep(1.0, [60, 30])

    def test_frozen_mask_zeroes_updates(self):
        # ref frozen/active param groups: solver/build.py:20-22
        import optax

        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        params = {"a": jnp.ones((4,)), "b": jnp.ones((4,))}
        mask = {"a": True, "b": False}
        tx = make_optimizer(cfg, frozen_mask=mask)
        state = tx.init(params)
        grads = {"a": jnp.full((4,), 2.0), "b": jnp.full((4,), 2.0)}
        updates, _ = tx.update(grads, state, params)
        assert np.all(np.asarray(updates["a"]) == 0.0)
        assert np.any(np.asarray(updates["b"]) != 0.0)


class TestMaskLoss:
    def test_gating_and_scale(self):
        n = 100
        acc = jnp.zeros((3, n, 1))
        labels = jnp.zeros((n,), jnp.int32)
        # perfect separation: performer acc 0 on bkgd rays, bkgd acc 1
        acc = acc.at[0].set(1.0)
        assert float(mask_alpha_loss(acc, labels)) == 0.0
        # leaky performer alpha on background rays -> gated loss appears
        acc_bad = acc.at[1].set(0.5)
        val = float(mask_alpha_loss(acc_bad, labels))
        assert val == pytest.approx(0.5 * n / 1e5)

    def test_below_gate_is_zero(self):
        n = 100
        acc = jnp.zeros((3, n, 1)).at[0].set(1.0)
        labels = jnp.zeros((n,), jnp.int32)
        acc = acc.at[1, 0].set(0.01)  # total 0.01 < n*5e-4
        assert float(mask_alpha_loss(acc, labels)) == 0.0


class TestCheckpoint:
    def test_save_load_latest(self, tmp_path):
        params = {"a": np.ones((2, 2), np.float32)}
        opt = {"m": np.zeros(3, np.float32)}
        save_checkpoint(str(tmp_path), params, opt, epoch=1)
        save_checkpoint(str(tmp_path), params, opt, epoch=2, step=500)
        save_checkpoint(str(tmp_path), params, opt, epoch=2)
        path = latest_checkpoint(str(tmp_path))
        assert path.endswith("layered_rfnr_checkpoint_2_500.ckpt")
        blob = load_checkpoint(path)
        assert blob["epoch"] == 2 and blob["step"] == 500
        np.testing.assert_allclose(blob["params"]["a"], 1.0)

    @pytest.mark.isolate  # imports torch: keep it out of the main process
    def test_reference_pt_roundtrip(self, tmp_path):
        from stnerf_tpu.engine import export_reference_checkpoint
        from stnerf_tpu.models.io_torch import load_reference_checkpoint

        params = jax.device_get(init_layered_params(jax.random.PRNGKey(0), SPEC))
        path = str(tmp_path / "layered_rfnr_checkpoint_3.pt")
        export_reference_checkpoint(path, params, SPEC)
        assert latest_checkpoint(str(tmp_path)) == path
        back = load_reference_checkpoint(path, SPEC)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    atol=1e-6),
            params, back)


def _toy_batch(n=64):
    inputs = make_rays(n)
    # target: mid-gray everywhere
    rgb = jnp.full((n, 3), 0.4)
    labels = jnp.zeros((n,), jnp.int32)
    return TrainBatch(inputs, rgb, labels)


class TestTrainStep:
    def test_loss_decreases(self):
        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000

        optimizer = make_optimizer(cfg)
        step = make_train_step(SPEC, optimizer, remove_outliers=True)
        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        opt_state = optimizer.init(params)
        scene = make_scene()
        batch = _toy_batch()
        key = jax.random.PRNGKey(0)

        losses = []
        for i in range(15):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, scene, batch,
                                              sub, jnp.asarray(1.0),
                                              only_coarse=False)
            losses.append(float(metrics.loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8, losses

    def test_loss_decreases_fast_fine_train(self):
        """Opt-in TPU.FAST_FINE_TRAIN: the step trains end-to-end through
        the sort-free carried-coarse/new-stream compositor."""
        import dataclasses

        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000

        spec = dataclasses.replace(SPEC, fast_fine=True,
                                   fast_fine_train=True)
        optimizer = make_optimizer(cfg)
        step = make_train_step(spec, optimizer, remove_outliers=True)
        params = init_layered_params(jax.random.PRNGKey(0), spec)
        opt_state = optimizer.init(params)
        scene = make_scene()
        batch = _toy_batch()
        key = jax.random.PRNGKey(0)

        losses = []
        for i in range(15):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, scene,
                                              batch, sub, jnp.asarray(1.0),
                                              only_coarse=False)
            losses.append(float(metrics.loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8, losses

    def test_coarse_stage_runs(self):
        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        optimizer = make_optimizer(cfg)
        step = make_train_step(SPEC, optimizer, remove_outliers=False)
        params = init_layered_params(jax.random.PRNGKey(1), SPEC)
        before = jax.device_get(params)  # params buffer is donated to step()
        opt_state = optimizer.init(params)
        p2, _, metrics = step(params, opt_state, make_scene(), _toy_batch(),
                              jax.random.PRNGKey(2), jnp.asarray(0.0),
                              only_coarse=True)
        assert np.isfinite(float(metrics.loss))
        # params actually moved
        delta = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                    for a, b in zip(jax.tree.leaves(before),
                                    jax.tree.leaves(jax.device_get(p2))))
        assert delta > 0


class TestTrainEpoch:
    def test_scanned_epoch_reduces_loss(self):
        from stnerf_tpu.config import get_cfg
        from stnerf_tpu.engine.trainer import make_train_epoch

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000
        optimizer = make_optimizer(cfg)
        epoch_fn = make_train_epoch(SPEC, optimizer, remove_outliers=True)

        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        opt_state = optimizer.init(params)
        pool = _toy_batch(256)
        scene = make_scene()

        first = last = None
        key = jax.random.PRNGKey(1)
        for e in range(4):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = epoch_fn(
                params, opt_state, scene, pool, sub, jnp.asarray(1.0),
                batch_size=64, steps=4, only_coarse=False)
            m = jax.device_get(metrics)
            assert m.loss.shape == (4,)
            assert np.isfinite(m.loss).all()
            if first is None:
                first = float(m.loss[0])
            last = float(m.loss[-1])
        assert last < first * 0.9, (first, last)

    @pytest.mark.isolate  # extra scanned-epoch program (block-draw variant)
    def test_scanned_epoch_block_draw(self):
        """block > 1 (locality-preserving contiguous draws for hit-ordered
        pools) trains the same way: finite metrics, loss decreasing."""
        from stnerf_tpu.config import get_cfg
        from stnerf_tpu.engine.trainer import make_train_epoch

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000
        optimizer = make_optimizer(cfg)
        epoch_fn = make_train_epoch(SPEC, optimizer, block=8)

        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        opt_state = optimizer.init(params)
        pool = _toy_batch(250)   # n_pool not a block multiple: tail unused
        scene = make_scene()

        first = last = None
        key = jax.random.PRNGKey(1)
        for e in range(4):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = epoch_fn(
                params, opt_state, scene, pool, sub, jnp.asarray(1.0),
                batch_size=64, steps=4, only_coarse=False)
            m = jax.device_get(metrics)
            assert np.isfinite(m.loss).all()
            if first is None:
                first = float(m.loss[0])
            last = float(m.loss[-1])
        assert last < first * 0.9, (first, last)


class TestFrozenGroups:
    def test_make_frozen_mask_and_step_keeps_frozen_bits(self):
        # ref: solver/build.py:20-22 (frozen group trains at lr=0)
        from stnerf_tpu.config import get_cfg
        from stnerf_tpu.engine import make_frozen_mask

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.BASE_LR = 1e-2
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000

        params = init_layered_params(jax.random.PRNGKey(0), SPEC)
        mask = make_frozen_mask(params, ["bkgd_coarse", "motion"])
        assert mask["bkgd_coarse"] and mask["motion"]
        assert not mask["layers_fine"]
        assert make_frozen_mask(params, []) is None
        with pytest.raises(ValueError):
            make_frozen_mask(params, ["no_such_group"])

        optimizer = make_optimizer(cfg, frozen_mask=mask)
        step = make_train_step(SPEC, optimizer)
        before = jax.tree.map(np.asarray, params)
        new_params, _, _ = step(params, optimizer.init(params), make_scene(),
                                _toy_batch(64), jax.random.PRNGKey(1),
                                jnp.asarray(0.0), only_coarse=False)
        after = jax.tree.map(np.asarray, new_params)
        for grp in ("bkgd_coarse", "motion"):
            chex = jax.tree.leaves(jax.tree.map(
                lambda a, b: np.array_equal(a, b), before[grp], after[grp]))
            assert all(chex), f"frozen group {grp} changed"
        moved = jax.tree.leaves(jax.tree.map(
            lambda a, b: not np.array_equal(a, b),
            before["layers_coarse"], after["layers_coarse"]))
        assert any(moved), "active group did not train"


class TestDoTrain:
    """Host-loop behavior: ceil-split segments (no dropped steps), in-epoch
    CHECKPOINT_PERIOD saves (ref: engine/layered_trainer.py:311-317), and
    bit-exact mid-epoch resume from a killed run."""

    def _cfg(self, out_dir):
        from stnerf_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WARMUP_ITERS = 1
        cfg.SOLVER.START_ITERS = 10_000
        cfg.SOLVER.END_ITERS = 20_000
        cfg.SOLVER.MAX_EPOCHS = 3          # epochs 1..2
        cfg.SOLVER.IMS_PER_BATCH = 64
        cfg.SOLVER.COARSE_STAGE = 0
        cfg.SOLVER.CHECKPOINT_PERIOD = 2
        cfg.SOLVER.VAL_PERIOD = 2
        cfg.SOLVER.LOG_PERIOD = 100
        cfg.MODEL.REMOVE_OUTLIERS = False
        cfg.TPU.EPOCH_SEGMENT_STEPS = 2    # 5 steps -> segments [2, 2, 1]
        cfg.OUTPUT_DIR = str(out_dir)
        return cfg

    def _pool(self, n=320):
        from stnerf_tpu.models.rays import pack_rays

        batch = _toy_batch(n)
        return {"rays": np.asarray(pack_rays(batch.inputs, SPEC)),
                "rgbs": np.asarray(batch.rgb),
                "labels": np.asarray(batch.labels),
                "near_fars": np.asarray(batch.inputs.near_far)}

    def test_segments_checkpoints_and_bitexact_resume(self, tmp_path):
        from stnerf_tpu.config import get_cfg
        from stnerf_tpu.engine import load_checkpoint
        from stnerf_tpu.engine.trainer import do_train

        cfg = self._cfg(tmp_path / "a")
        params0 = init_layered_params(jax.random.PRNGKey(0), SPEC)
        pool = self._pool()
        scene = make_scene()
        val_calls = []

        def val_fn(params, epoch, step=None):
            val_calls.append((epoch, step))

        optimizer = make_optimizer(cfg)
        params_a, _ = do_train(cfg, SPEC, jax.tree.map(jnp.copy, params0),
                               scene, dict(pool), optimizer, val_fn=val_fn,
                               seed=7)
        files = sorted(os.listdir(tmp_path / "a"))
        # ceil-split runs all 5 steps; CHECKPOINT_PERIOD=2 saves at steps 2
        # and 4 of each epoch plus the per-epoch save
        for name in ["layered_rfnr_checkpoint_1_2.ckpt",
                     "layered_rfnr_checkpoint_1_4.ckpt",
                     "layered_rfnr_checkpoint_1.ckpt",
                     "layered_rfnr_checkpoint_2_2.ckpt",
                     "layered_rfnr_checkpoint_2.ckpt"]:
            assert name in files, (name, files)
        # mid-epoch validation fired with a global step
        assert (1, 2) in val_calls and (1, None) in val_calls

        # "kill" after the first mid-epoch save of epoch 1 and resume
        blob = load_checkpoint(str(tmp_path / "a" /
                                   "layered_rfnr_checkpoint_1_2.ckpt"))
        assert blob["epoch"] == 1 and blob["step"] == 2
        cfg_b = self._cfg(tmp_path / "b")
        params_b, _ = do_train(cfg_b, SPEC, blob["params"], scene, dict(pool),
                               make_optimizer(cfg_b),
                               resume_epoch=blob["epoch"] - 1,
                               resume_step=blob["step"],
                               opt_state=blob["opt_state"], seed=7)
        ok = jax.tree.leaves(jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            params_a, params_b))
        assert all(ok), "mid-epoch resume diverged from uninterrupted run"


class TestSupervise:
    """tools/train.py --auto-restart: the crash-relaunch supervisor
    (failure recovery for TPU worker death / tunnel outages; pairs with
    the segmented-epoch mid-run checkpoints so a crash loses at most one
    segment)."""

    def _load(self):
        import importlib.util
        root = os.path.join(os.path.dirname(__file__), "..")
        p = os.path.join(root, "tools", "train.py")
        s = importlib.util.spec_from_file_location("train_cli", p)
        m = importlib.util.module_from_spec(s)
        s.loader.exec_module(m)
        return m

    def test_retries_until_success_and_appends_resume(self):
        m = self._load()
        calls = []

        def fake_run(cmd):
            calls.append(list(cmd))
            return 1 if len(calls) < 3 else 0

        rc = m.supervise(["prog", "-c", "x.yml"], restarts=5,
                         backoffs=(0,), run=fake_run)
        assert rc == 0 and len(calls) == 3
        assert "--resume" not in calls[0]          # first attempt untouched
        assert calls[1][-1] == "--resume"          # retries resume
        assert calls[2].count("--resume") == 1     # appended once

    def test_gives_up_after_n_restarts(self):
        m = self._load()
        calls = []
        rc = m.supervise(["prog"], restarts=2, backoffs=(0,),
                         run=lambda c: calls.append(1) or 7)
        assert rc == 7 and len(calls) == 3          # 1 attempt + 2 restarts

    def test_zero_restarts_runs_once(self):
        m = self._load()
        calls = []
        rc = m.supervise(["prog"], restarts=0, backoffs=(0,),
                         run=lambda c: calls.append(1) or 3)
        assert rc == 3 and len(calls) == 1
