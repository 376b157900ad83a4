"""Training-ray pregeneration with on-disk caching.

Host-side counterpart of the reference's ``Ray_Frame_Layer_Dataset`` /
``Ray_Dataset`` pipeline (ref: data/datasets/ray_dataset.py:339-455, 13-83):
for every (layer, frame) it walks the cameras, selects pixels — by
segmentation id when a label map is used, else by the projected-bbox ROI —
converts them to packed rays (+ camera/frame id columns per model flags),
shuffles and subsamples (background keeps ``BKGD_SAMPLE_RATE``), and caches
flat arrays to ``{TMP_RAYS}/frame{F}/layer{L}/rays.npz``. The flat ray pool
is exactly what a TPU input pipeline wants: fixed-size random batches with
zero per-step host work.
"""

from __future__ import annotations

import multiprocessing
import os

import numpy as np

from .cameras import pixel_rays_at, project_bbox_roi
from .scene import FrameLayerScene, corners_from_minmax


def _select_rays(image, label, K, T, layer_id: int, bbox, use_label_map: bool,
                 rate: float = 1.0, rng: np.random.Generator | None = None):
    """Pixel selection for one camera.

    use_label_map: keep pixels whose segmentation == layer_id
    (ref: utils/ray_sampling.py:194-240). Otherwise: keep the projected-bbox
    ROI crop with its labels (ref: utils/ray_sampling.py:75-192).
    Returns (rays (N,6), labels (N,1), rgbs (N,3)).

    ``rate < 1`` subsamples the kept pixel set *before* ray arithmetic.
    The reference subsamples the concatenated all-camera pool instead
    (ref: ray_dataset.py:429-439) — per-camera sampling draws from the same
    distribution at ~1/rate less host work, which dominates pregeneration
    wall-clock for background layers (BKGD_SAMPLE_RATE ≈ 0.05 at 1080p).
    """
    _, H, W = image.shape
    lab_flat = label.reshape(-1)

    if use_label_map:
        keep_idx = np.flatnonzero(lab_flat == layer_id)
    else:
        roi = (project_bbox_roi(corners_from_minmax(bbox[0], bbox[1]), K, T, H, W)
               if bbox is not None else (0, H, 0, W))
        minh, maxh, minw, maxw = roi
        vs, us = np.meshgrid(np.arange(minh, maxh), np.arange(minw, maxw),
                             indexing="ij")
        keep_idx = (vs * W + us).reshape(-1)

    if rate < 1.0 and keep_idx.size:
        n_keep = int(keep_idx.size * rate)
        keep_idx = (rng or np.random.default_rng()).choice(
            keep_idx, size=n_keep, replace=False)
        keep_idx.sort()

    vs, us = np.divmod(keep_idx, W)
    rays = pixel_rays_at(K, T, us, vs)
    # planar gather: no full-image HWC copy
    rgbs = np.ascontiguousarray(image.reshape(3, -1)[:, keep_idx].T)
    return rays, lab_flat[keep_idx, None].astype(label.dtype), rgbs


def _append_id_columns(rays, cam_id, frame_id, spec):
    cols = [rays]
    n = rays.shape[0]
    if spec.pose_refinement:
        # packed pose-refinement layout [o, cam, d, cam]
        # (ref: ray_dataset.py:407-410)
        ids = np.full((n, 1), cam_id, np.float32)
        cols = [rays[:, :3], ids, rays[:, 3:6], ids]
        rays = np.concatenate(cols, 1)
        cols = [rays]
    if spec.use_deform_view:
        cols.append(np.full((n, 1), cam_id, np.float32))
    if spec.use_deform_time or spec.use_space_time:
        cols.append(np.full((n, 1), frame_id, np.float32))
    return np.concatenate(cols, 1) if len(cols) > 1 else rays


def _cache_path(cfg, frame_id: int, layer_id: int) -> str:
    d = cfg.DATASETS
    return os.path.join(d.TRAIN, d.TMP_RAYS, f"frame{frame_id}",
                        f"layer{layer_id}", "rays.npz")


def generate_frame_layer_rays(cfg, spec, transform, frame_id: int,
                              layer_id: int, use_label_map: bool,
                              sample_rate: float,
                              rng: np.random.Generator) -> dict:
    """Build (or load from cache) the ray set of one (frame, layer)."""
    d = cfg.DATASETS
    cache = _cache_path(cfg, frame_id, layer_id)
    cache_dir = os.path.dirname(cache)
    empty = {"rays": np.zeros((0, 6), np.float32),
             "rgbs": np.zeros((0, 3), np.float32),
             "labels": np.zeros((0, 1), np.float32),
             "near_fars": np.zeros((0, 2), np.float32)}
    if sample_rate == 0.0:
        return empty

    if os.path.exists(cache) and not cfg.clean_ray:
        with np.load(cache) as z:
            return {k: z[k] for k in z.files}

    scene = FrameLayerScene(cfg, transform, frame_id, layer_id)
    rays_l, rgbs_l, labels_l, nf_l = [], [], [], []
    for cam in range(0, scene.cam_num, d.CAMERA_STEPSIZE):
        image, label, K, T, _, bbox, near_far, ok = scene.get_data(cam)
        if not ok:
            continue
        rays, labels, rgbs = _select_rays(image, label, K, T, layer_id, bbox,
                                          use_label_map, sample_rate, rng)
        rays = _append_id_columns(rays, cam, frame_id, spec)
        rays_l.append(rays)
        rgbs_l.append(rgbs)
        labels_l.append(labels.astype(np.float32))
        nf_l.append(np.repeat(near_far, rays.shape[0], axis=0))

    if not rays_l:
        return empty
    out = {"rays": np.concatenate(rays_l), "rgbs": np.concatenate(rgbs_l),
           "labels": np.concatenate(labels_l), "near_fars": np.concatenate(nf_l)}
    os.makedirs(cache_dir, exist_ok=True)
    # uncompressed: zlib on float32 rays compresses poorly and costs minutes
    # per (frame, layer) at capture scale on a single host core
    np.savez(cache, **out)
    return out


def _layer_rate(d, layer_id: int) -> tuple[float, bool]:
    """(sample_rate, use_label_map) for a layer — background keeps
    BKGD_SAMPLE_RATE and always selects by segmentation; frozen layers
    contribute no rays (ref: ray_dataset.py:29-43)."""
    if layer_id == 0:
        return d.BKGD_SAMPLE_RATE, True
    rate = 0.0 if layer_id in list(d.FIXED_LAYER) else 1.0
    return rate, d.USE_LABEL


def _prefill_task(args):
    """One (frame, layer) pregeneration unit — module-level so it pickles
    into multiprocessing workers."""
    cfg, spec, frame_id, layer_id, use_label, rate, seed = args
    from .transforms import JointTransform

    d = cfg.DATASETS
    rng = np.random.default_rng(seed)
    transform = JointTransform((cfg.INPUT.SIZE_TRAIN[1], cfg.INPUT.SIZE_TRAIN[0]),
                               d.SHIFT, d.MAXRATION, d.ROTATION, rng=rng)
    generate_frame_layer_rays(cfg, spec, transform, frame_id, layer_id,
                              use_label, rate, rng)
    return frame_id, layer_id


def prefill_ray_caches(cfg, spec, workers: int = 1, seed: int = 0) -> int:
    """Populate the per-(frame, layer) ray caches in parallel.

    The reference pregenerates rays serially inside the first training epoch
    — hours of host work at capture scale (101 frames x ~70 cams at 1080p,
    ref: data/datasets/ray_dataset.py:374-451). Each (frame, layer) unit is
    independent, so they fan out over a process pool; every unit draws from
    its own seeded RNG, making the result independent of worker count.
    Returns the number of units actually generated (cache misses).
    """
    d = cfg.DATASETS
    frames = range(1 + d.FRAME_OFFSET, d.FRAME_OFFSET + d.FRAME_NUM + 1)
    tasks = []
    # frame-major: the serial path then reuses the decoded-image LRU cache
    # across a frame's layers (workers share nothing, so their order is
    # only a tie-break)
    for frame_id in frames:
        for layer_id in range(d.LAYER_NUM + 1):
            rate, use_label = _layer_rate(d, layer_id)
            if rate == 0.0:
                continue
            if os.path.exists(_cache_path(cfg, frame_id, layer_id)) \
                    and not cfg.clean_ray:
                continue
            tasks.append((cfg, spec, frame_id, layer_id, use_label, rate,
                          (seed, frame_id, layer_id)))
    if not tasks:
        return 0
    if workers > 1 and len(tasks) > 1:
        # spawn, not fork: the parent typically has live XLA/PIL threads by
        # the time pregeneration runs and forked children deadlock on
        # inherited locks. Workers never touch the TPU (pure NumPy/PIL).
        ctx = multiprocessing.get_context("spawn")
        with ctx.Pool(min(workers, len(tasks))) as pool:
            pool.map(_prefill_task, tasks, chunksize=1)
    else:
        for t in tasks:
            _prefill_task(t)
    return len(tasks)


def build_ray_pool(cfg, spec, rng: np.random.Generator | None = None,
                   transform=None, workers: int = 1) -> tuple[dict, np.ndarray]:
    """Pregenerate the full training pool over all layers x frames.

    Returns (pool dict of flat arrays, bboxes (F+offset, L, 2, 3)) —
    the per-frame performer bboxes feed SceneBoxes.
    (ref: Ray_Dataset.__init__, ray_dataset.py:15-65)

    ``workers > 1`` fans the per-(frame, layer) pregeneration out over a
    process pool before the (cache-served) assembly loop.
    """
    from .transforms import JointTransform

    d = cfg.DATASETS
    rng = rng or np.random.default_rng(0)
    if workers > 1:
        prefill_ray_caches(cfg, spec, workers=workers)
    if transform is None:
        transform = JointTransform((cfg.INPUT.SIZE_TRAIN[1], cfg.INPUT.SIZE_TRAIN[0]),
                                   d.SHIFT, d.MAXRATION, d.ROTATION, rng=rng)

    frames = range(1 + d.FRAME_OFFSET, d.FRAME_OFFSET + d.FRAME_NUM + 1)
    boxes = np.zeros((d.FRAME_NUM + d.FRAME_OFFSET, d.LAYER_NUM, 2, 3), np.float32)
    parts = []
    # frame-major so all layers of a frame reuse the decoded-image LRU
    # cache (scene._decoded_image); pool order is irrelevant downstream —
    # the trainer draws random batches
    for frame_id in frames:
        for layer_id in range(d.LAYER_NUM + 1):
            rate, use_label = _layer_rate(d, layer_id)
            part = generate_frame_layer_rays(cfg, spec, transform, frame_id,
                                             layer_id, use_label, rate, rng)
            if layer_id != 0:
                scene = FrameLayerScene(cfg, transform, frame_id, layer_id)
                if scene.bbox is not None:
                    boxes[frame_id - 1, layer_id - 1] = scene.bbox
            # every ray of this set nominally belongs to this layer
            # (ref: ray_dataset.py:454); the true pixel segmentation stays in
            # "labels" and drives the mask-alpha loss
            part = dict(part)
            part["bbox_labels"] = np.full_like(part["labels"], layer_id)
            parts.append(part)

    pool = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    cap = getattr(d, "MAX_POOL_RAYS", 0)
    n = pool["rays"].shape[0]
    if cap and n > cap:
        keep = rng.choice(n, size=cap, replace=False)
        keep.sort()
        pool = {k: v[keep] for k, v in pool.items()}
    return pool, boxes
