"""Measure the PyTorch reference's OWN training throughput (rays/s) on this
host's CPU — the measured anchor BASELINE.md needs next to the 5e4 rays/s
GPU *estimate* (no CUDA device exists in this environment).

Method: the reference's real training step at the bench workload shape
(2 performer layers + background, 90 coarse + 30 fine samples/ray,
space-time + deformation MLPs, SOLVER.BUNCH=2000 rays/batch):

* model:      ``LayeredRFRender`` built by the parity harness
              (tests/ref_harness.build_ref_model — the reference's own
              modules, CPU torch, anomaly detection off as the reference's
              demos run it),
* step:       forward -> ``loss1 + loss2`` (MSE coarse + fine, the
              steady-state epoch>=3 objective,
              ref: engine/layered_trainer.py:279-283) -> ``backward`` ->
              ``Adam.step`` (ref: solver/build.py) + scheduler step
              (ref: solver/lr_scheduler.py via build_scheduler),
* metric:     rays/s = BUNCH / step-time — the very number the reference
              logs (ref: engine/layered_trainer.py:304-306).

The mask-loss epochs (epoch<3, remove_outliers) add per-layer gathers on
top; steady state is the *fastest* regime for the reference, so this is a
conservative (reference-favoring) anchor.

Run standalone (pure-torch process; never inside a long-lived XLA process):
    python -u tools/ref_train_bench.py [--batch 2000] [--steps 3]
Prints one JSON line and appends nothing — record the value in BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2000,
                    help="rays per step (SOLVER.BUNCH)")
    ap.add_argument("--steps", type=int, default=3, help="timed steps")
    ap.add_argument("--coarse", type=int, default=90)
    ap.add_argument("--fine", type=int, default=30)
    args = ap.parse_args()

    import torch

    from stnerf_tpu.config import get_cfg
    from tests.ref_harness import corners_from_minmax, load_reference, make_ref_cfg

    lrf = load_reference()
    from solver import build_scheduler, make_optimizer  # reference's own

    cfg = get_cfg()
    # both reference scene configs ship POSE_REFINEMENT: False, and
    # bench.py's workloads match; keep the comparison apples-to-apples
    cfg.MODEL.POSE_REFINEMENT = False
    cfg.DATASETS.LAYER_NUM = 2
    cfg.MODEL.SAMPLE_METHOD = "BBOX"
    cfg.MODEL.USE_SPACE_TIME = True
    cfg.MODEL.USE_DEFORM_TIME = True
    cfg.MODEL.COARSE_RAY_SAMPLING = args.coarse
    cfg.MODEL.FINE_RAY_SAMPLING = args.fine
    rc = make_ref_cfg(cfg)
    # the reference trains with Adam (its configs/*.yml all set this; the
    # schema default "SGD" is an unimplemented branch in solver/build.py)
    rc.SOLVER.OPTIMIZER_NAME = "Adam"

    torch.manual_seed(0)
    model = lrf.LayeredRFRender(rc, 1)
    # same scene the TPU train bench uses (bench.py train_throughput)
    boxes = np.array([[[-1.0, -1, 0], [1, 1, 2]],
                      [[-1.0, 1, 0], [1, 3, 2]]], np.float32)
    corners = np.stack([np.stack([corners_from_minmax(b[0], b[1])
                                  for b in boxes])] * 3)
    model.set_bboxes(torch.from_numpy(corners))
    model.set_bkgd_bbox(torch.from_numpy(
        corners_from_minmax([-8.0, -8, -8], [8.0, 8, 8])))
    model.train()

    optimizer = make_optimizer(rc, model)
    scheduler = build_scheduler(optimizer, rc.SOLVER.WARMUP_ITERS,
                                rc.SOLVER.START_ITERS, rc.SOLVER.END_ITERS,
                                rc.SOLVER.LR_SCALE)
    loss_fn = torch.nn.MSELoss()

    n = args.batch
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] += 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([np.tile([[0, 0, -5.0]], (n, 1)).astype(np.float32),
                           d, rng.integers(1, 4, (n, 1)).astype(np.float32)],
                          axis=1)  # [o, d, frame] — 7-wide, non-retiming
    rays_t = torch.from_numpy(rays)
    rgbs = torch.from_numpy(rng.uniform(size=(n, 3)).astype(np.float32))
    labels = torch.from_numpy(rng.integers(0, 3, (n, 1)).astype(np.float32))

    def step():
        t0 = time.time()
        optimizer.zero_grad()
        stage2, stage1, _, _, _ = model(rays_t, labels, None, False)
        loss = loss_fn(stage1[0], rgbs) + loss_fn(stage2[0], rgbs)
        loss.backward()
        optimizer.step()
        scheduler.step()
        return time.time() - t0, float(loss.detach())

    warm_s, warm_loss = step()  # first step pays allocator warmup
    times = [step()[0] for _ in range(args.steps)]
    best = min(times)
    print(json.dumps({
        "metric": "ref_train_rays_per_s_cpu",
        "value": round(n / best, 1),
        "unit": "rays/s",
        "method": "reference LayeredRFRender fwd+bwd+Adam+sched, CPU torch, "
                  f"batch {n}, {args.coarse}+{args.fine} samples, "
                  "L=2+bkgd, steady-state loss (epoch>=3)",
        "detail": {"best_step_s": round(best, 3),
                   "mean_step_s": round(sum(times) / len(times), 3),
                   "warmup_step_s": round(warm_s, 3),
                   "warmup_loss": round(warm_loss, 5),
                   "torch_threads": torch.get_num_threads(),
                   "steps": args.steps}}))


if __name__ == "__main__":
    main()
