"""Occupancy-driven empty-space skipping: tighten scene bboxes to where the
trained fields actually have density.

The reference samples every ray uniformly across the dataset's per-frame
point-cloud bbox (ref: layers/RaySamplePoint.py:64-102) — for a performer
that box is a loose axis-aligned hull around a human, so most coarse samples
land in empty space. After training, the field itself knows where the matter
is: evaluate each layer's sigma on a regular grid inside its bbox once per
frame, threshold, and shrink the box to the tight axis-aligned hull of the
occupied voxels (one dilation voxel of slack). Rays then spend their fixed
sample budget inside the occupied region: the first surface is reached at an
earlier sample index (more early-exit skips, see
``LayeredSpec.coarse_exit_segments``), fewer kernel tiles hit the box at all
(more per-tile skips), and the importance distribution sharpens.

This is a data-level refinement: it returns a new ``SceneBoxes`` and nothing
in the render path changes. It is an opt-in approximation
(``TPU.OCCUPANCY_SKIP``) because sample *positions* move — the error is
bounded by the sigma threshold (a culled voxel contributes alpha
< 1 - exp(-tau * delta) per sample). ``tau=0`` is exact by construction:
relu(sigma) >= 0 everywhere, so every voxel is occupied and each box
round-trips to itself.

View deformation (``use_deform_view``) is camera-dependent and ignored here;
the dilation voxel absorbs sub-voxel flow. Time deformation (MotionNet) IS
applied — occupancy is evaluated in world space at each frame, exactly as
``render_rays`` queries the fields.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layered import LayeredSpec, SceneBoxes
from ..models.motionnet import apply_motionnet_planar
from ..models.spacenet import apply_spacenet_planar
from ..utils import setup_logger

logger = setup_logger("stnerf_tpu.occupancy")


def _grid_points(box: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Voxel-center world coordinates for a (2, 3) box -> (3, G, G, G)."""
    lo, hi = box[0], box[1]
    centers = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid  # (G,)
    axes = [lo[a] + centers * (hi[a] - lo[a]) for a in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([gx, gy, gz])


def _axis_extent(occ: jnp.ndarray, axis: int, grid: int):
    """(lo_idx, hi_idx) of the occupied span along ``axis`` of a bool cube."""
    line = jnp.any(occ, axis=tuple(a for a in range(3) if a != axis))  # (G,)
    lo = jnp.argmax(line)
    hi = grid - 1 - jnp.argmax(line[::-1])
    return lo, hi


@functools.partial(jax.jit, static_argnames=("spec", "bkgd", "grid"))
def _occupied_extent(net_params: dict, spec: LayeredSpec, box: jnp.ndarray,
                     frame_id: jnp.ndarray, tau: jnp.ndarray, *,
                     bkgd: bool, grid: int):
    """Evaluate a layer's field(s) on a ``grid``^3 lattice inside ``box`` and
    return (lo_idx (3,), hi_idx (3,), any_occ ()) of the sigma >= tau region.

    ``net_params``: {"coarse": pytree, "fine": pytree or None,
    "motion": pytree or None} for ONE layer. ``box`` (2, 3) and ``frame_id``
    () are traced, so one compile serves every (frame, layer) of a kind.
    Occupancy is the union (elementwise max of relu sigma) over the coarse
    and fine nets — the refined box must contain whatever either stage sees.
    """
    sn_spec = spec.spacenet_spec(bkgd=bkgd)
    xyz = _grid_points(box, grid)                    # (3, G, G, G)
    ids = jnp.broadcast_to(frame_id, xyz.shape[1:])  # (G, G, G)

    if net_params.get("motion") is not None:
        m_spec = spec.motion_spec(input_time=not bkgd)
        xyz = xyz + apply_motionnet_planar(net_params["motion"], m_spec,
                                           xyz, ids, spec.dtype)

    dirs = jnp.zeros_like(xyz) if sn_spec.use_dir else None
    times = ids if sn_spec.use_time else None

    def sigma_of(p):
        _, sig = apply_spacenet_planar(p, sn_spec, xyz, dirs, times, spec.dtype)
        return jax.nn.relu(sig)                      # compositor sees relu(sigma)

    sig = sigma_of(net_params["coarse"])
    if net_params.get("fine") is not None:
        sig = jnp.maximum(sig, sigma_of(net_params["fine"]))

    occ = sig >= tau                                 # (G, G, G)
    los, his = zip(*(_axis_extent(occ, a, grid) for a in range(3)))
    return jnp.stack(los), jnp.stack(his), jnp.any(occ)


def _shrink(box: np.ndarray, lo_idx, hi_idx, grid: int, pad: int) -> np.ndarray:
    """Host: occupied index span -> world sub-box, dilated and clamped."""
    lo, hi = box[0], box[1]
    voxel = (hi - lo) / grid
    new_lo = np.maximum(lo, lo + (np.asarray(lo_idx) - pad) * voxel)
    new_hi = np.minimum(hi, lo + (np.asarray(hi_idx) + 1 + pad) * voxel)
    return np.stack([new_lo, new_hi]).astype(np.float32)


def _layer_net_params(params: dict, spec: LayeredSpec, layer: int) -> dict:
    """Slice one performer layer's nets out of the stacked param pytrees."""
    i = layer - 1
    take = lambda tree: jax.tree.map(lambda a: a[i], tree)
    return {
        "coarse": take(params["layers_coarse"]),
        "fine": (None if spec.same_spacenet else take(params["layers_fine"])),
        "motion": (take(params["motion"]) if spec.use_deform_time else None),
    }


def _bkgd_net_params(params: dict, spec: LayeredSpec) -> dict:
    return {
        "coarse": params["bkgd_coarse"],
        "fine": (None if spec.same_spacenet else params["bkgd_fine"]),
        "motion": (params["bkgd_motion"] if spec.bkgd_use_deform_time else None),
    }


def refine_scene_boxes(params: dict, spec: LayeredSpec, scene: SceneBoxes,
                       grid: int = 64, sigma_thresh: float = 1.0,
                       pad_voxels: int = 1,
                       refine_bkgd: bool = False) -> SceneBoxes:
    """Return ``scene`` with each per-frame performer box (and optionally the
    background box) shrunk to the trained field's occupied region.

    Degenerate rows (zero boxes from ``FRAME_OFFSET`` padding) and layers
    with no occupancy above ``sigma_thresh`` keep their original box — a
    mis-set threshold degrades to the exact baseline instead of deleting a
    performer.
    """
    boxes = np.asarray(scene.boxes).copy()           # (F, L, 2, 3)
    F, L = boxes.shape[:2]
    tau = jnp.float32(sigma_thresh)
    shrunk = total = 0
    vol = lambda b: float(np.prod(np.maximum(b[1] - b[0], 0.0)))

    for layer in range(1, L + 1):
        net = _layer_net_params(params, spec, layer)
        for f in range(F):
            box = boxes[f, layer - 1]
            if not np.all(box[1] > box[0]):
                continue                             # FRAME_OFFSET zero row
            total += 1
            lo_i, hi_i, any_occ = _occupied_extent(
                net, spec, jnp.asarray(box), jnp.float32(f + 1), tau,
                bkgd=False, grid=grid)
            if not bool(any_occ):
                logger.warning(
                    "occupancy: layer %d frame %d has no sigma >= %.3g; "
                    "keeping the original box", layer, f + 1, sigma_thresh)
                continue
            new = _shrink(box, np.asarray(lo_i), np.asarray(hi_i), grid,
                          pad_voxels)
            if vol(new) < vol(box):
                shrunk += 1
            boxes[f, layer - 1] = new

    bkgd_box = np.asarray(scene.bkgd_box)
    if refine_bkgd:
        lo_i, hi_i, any_occ = _occupied_extent(
            _bkgd_net_params(params, spec), spec, jnp.asarray(bkgd_box),
            jnp.float32(1.0), tau, bkgd=True, grid=grid)
        if bool(any_occ):
            bkgd_box = _shrink(bkgd_box, np.asarray(lo_i), np.asarray(hi_i),
                               grid, pad_voxels)

    if total:
        logger.info("occupancy: tightened %d/%d performer boxes (grid %d, "
                    "tau %.3g)", shrunk, total, grid, sigma_thresh)
    return SceneBoxes(bkgd_box=jnp.asarray(bkgd_box),
                      boxes=jnp.asarray(boxes),
                      bkgd_near_far=scene.bkgd_near_far)


def refined_boxes_cached(params: dict, spec: LayeredSpec, scene: SceneBoxes,
                         cache_dir: str, ckpt_path: str | None,
                         grid: int = 64, sigma_thresh: float = 1.0,
                         pad_voxels: int = 1,
                         refine_bkgd: bool = False) -> SceneBoxes:
    """Disk-cached :func:`refine_scene_boxes`.

    The cache key covers the checkpoint identity (path + mtime) and every
    refinement knob, so retraining or re-tuning never serves stale boxes.
    """
    tag = "none"
    if ckpt_path and os.path.exists(ckpt_path):
        tag = f"{os.path.basename(ckpt_path)}_{int(os.path.getmtime(ckpt_path))}"
    name = (f"occ_boxes_{tag}_g{grid}_t{sigma_thresh:g}_p{pad_voxels}"
            f"_b{int(refine_bkgd)}.npz")
    path = os.path.join(cache_dir, name)
    if os.path.exists(path):
        data = np.load(path)
        logger.info("occupancy: loaded cached boxes %s", path)
        return SceneBoxes(bkgd_box=jnp.asarray(data["bkgd_box"]),
                          boxes=jnp.asarray(data["boxes"]),
                          bkgd_near_far=scene.bkgd_near_far)
    refined = refine_scene_boxes(params, spec, scene, grid=grid,
                                 sigma_thresh=sigma_thresh,
                                 pad_voxels=pad_voxels,
                                 refine_bkgd=refine_bkgd)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(path, bkgd_box=np.asarray(refined.bkgd_box),
                 boxes=np.asarray(refined.boxes))
        logger.info("occupancy: cached boxes -> %s", path)
    except OSError:
        pass
    return refined
