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

This is a data-level refinement: it returns a new ``SceneBoxes``. With
``slices == 1`` nothing in the render path changes; ``slices > 1``
(``TPU.OCC_SLICES``) additionally splits each box into sub-boxes along the
layer's dominant occupied axis and the sampler intersects their union
(models/layered._coarse_sample recognises the extra box rank) — per-ray
interval tightening for articulated performers whose single AABB is loose.
It is an opt-in approximation (``TPU.OCCUPANCY_SKIP``) because sample
*positions* move — the error is bounded by the sigma threshold (a culled
voxel contributes alpha < 1 - exp(-tau * delta) per sample). ``tau=0`` is
exact by construction: relu(sigma) >= 0 everywhere, so every voxel is
occupied, each box round-trips to itself, and slices tile the box (their
union interval is bitwise the single-box interval).

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


def _extent_from_cube(occ: np.ndarray):
    """Host: (lo_idx (3,), hi_idx (3,), any_occ) of a bool cube's occupied
    span along each axis."""
    if not occ.any():
        return np.zeros(3, np.int64), np.zeros(3, np.int64), False
    los, his = [], []
    for axis in range(3):
        line = occ.any(axis=tuple(a for a in range(3) if a != axis))
        idx = np.nonzero(line)[0]
        los.append(idx[0])
        his.append(idx[-1])
    return np.asarray(los), np.asarray(his), True


def _eps_alpha(min_db: float) -> float:
    """Map a PSNR floor to a per-ray culled-alpha budget. Removing matter
    with total alpha a changes a pixel by at most ~2a (its own emission is
    gone and everything behind it brightens by the freed transmittance),
    so worst-case RMSE <= 2a; PSNR >= min_db needs 2a <= 10^(-min_db/20)."""
    return 0.5 * 10.0 ** (-float(min_db) / 20.0)


def _culled_alpha_bound(sig: np.ndarray, keep: np.ndarray, box: np.ndarray,
                        grid: int) -> float:
    """Upper bound on ANY ray's alpha contribution from the culled voxels
    (``~keep``), from the sigma lattice itself.

    For a ray with dominant axis a (|d_a| >= 1/sqrt(3)), its path length
    inside one slab perpendicular to a is voxel_a/|d_a| <= sqrt(3)*voxel_a,
    and the sigma it sees there is at most the slab's max culled sigma; so
    the optical depth is <= sqrt(3)*voxel_a*sum_k max(culled sigma in slab
    k). Taking the max over the three axes covers every ray direction, and
    alpha = 1 - exp(-depth).
    """
    s = np.where(keep, 0.0, np.asarray(sig, np.float32))
    voxel = (np.asarray(box[1], np.float64) - np.asarray(box[0])) / grid
    depth = 0.0
    for a in range(3):
        other = tuple(x for x in range(3) if x != a)
        depth = max(depth, float(voxel[a]) * float(s.max(axis=other).sum()))
    return float(-np.expm1(-np.sqrt(3.0) * depth))


def _hull_keep_mask(occ: np.ndarray, grid: int, pad: int) -> np.ndarray:
    """Bool cube marking voxels inside the (padded) bounding hull of occ."""
    lo_i, hi_i, any_occ = _extent_from_cube(occ)
    keep = np.zeros(occ.shape, bool)
    if any_occ:
        lo = np.maximum(lo_i - pad, 0)
        hi = np.minimum(hi_i + pad, grid - 1)
        keep[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1] = True
    return keep


def _boxes_keep_mask(box: np.ndarray, sub_boxes: np.ndarray,
                     grid: int) -> np.ndarray:
    """Bool cube marking voxels of ``box``'s lattice whose centers fall in
    any of the (K, 2, 3) world ``sub_boxes``."""
    lo, hi = np.asarray(box[0], np.float64), np.asarray(box[1], np.float64)
    centers = [lo[a] + (np.arange(grid) + 0.5) * (hi[a] - lo[a]) / grid
               for a in range(3)]
    keep = np.zeros((grid,) * 3, bool)
    for sb in np.asarray(sub_boxes, np.float64):
        ins = [(centers[a] >= sb[0, a]) & (centers[a] <= sb[1, a])
               for a in range(3)]
        keep |= ins[0][:, None, None] & ins[1][None, :, None] & ins[2][None, None, :]
    return keep


def auto_tau(sig: np.ndarray, box: np.ndarray, grid: int, pad: int,
             eps_alpha: float) -> tuple[float, float]:
    """Largest occupancy threshold whose culled-voxel worst-case per-ray
    alpha (:func:`_culled_alpha_bound` over the hull complement) stays under
    ``eps_alpha`` -> (tau, bound). tau = 0.0 (exact: every voxel occupied,
    box round-trips) when even the smallest candidate violates the budget.

    The bound is monotone in tau (larger tau culls a superset), so the
    descending sweep returns the first — largest — admissible candidate.
    """
    sig = np.asarray(sig, np.float32)
    smax = float(sig.max())
    if not np.isfinite(smax) or smax <= 0.0:
        return 0.0, 0.0
    cands = np.geomspace(max(smax, 1e-3), 1e-3, 40)  # descending

    def bound_at(tau):
        return _culled_alpha_bound(
            sig, _hull_keep_mask(sig >= tau, grid, pad), box, grid)

    # culled set grows with tau, so admissibility (bound <= eps) flips once
    # from False to True as tau descends: binary-search the flip point
    left, right = 0, len(cands)
    while left < right:
        mid = (left + right) // 2
        if bound_at(cands[mid]) <= eps_alpha:
            right = mid
        else:
            left = mid + 1
    if left == len(cands):
        return 0.0, 0.0
    return float(cands[left]), bound_at(cands[left])


def auto_slice_tau(sig: np.ndarray, box: np.ndarray, axis: int, slices: int,
                   grid: int, pad: int, eps_alpha: float):
    """Largest tau whose K-sub-box culling (:func:`_slice_boxes` on the
    ``sig >= tau`` cube) keeps the worst-case per-ray culled alpha within
    ``eps_alpha`` -> (sub_boxes (K, 2, 3), tau, bound), or (None, 0, inf).

    Searched independently of the hull tau: per-slice extents tighten along
    EVERY axis, so slicing culls far more volume at a given threshold than
    the hull trim does, and the hull-admissible tau is usually far too
    aggressive for slicing. A descending linear scan (40 candidates) keeps
    correctness even where sub-box geometry makes the bound non-monotone.
    """
    sig = np.asarray(sig, np.float32)
    smax = float(sig.max())
    if not np.isfinite(smax) or smax <= 0.0:
        return None, 0.0, float("inf")
    for tau in np.geomspace(max(smax, 1e-3), 1e-3, 40):
        occ = sig >= tau
        if not occ.any():
            continue
        sub = _slice_boxes(box, occ, axis, slices, grid, pad)
        keep = _boxes_keep_mask(box, sub, grid)
        bound = _culled_alpha_bound(sig, keep, box, grid)
        if bound <= eps_alpha:
            return sub, float(tau), float(bound)
    return None, 0.0, float("inf")


@functools.partial(jax.jit, static_argnames=("spec", "bkgd", "grid"))
def _occupancy_cube(net_params: dict, spec: LayeredSpec, box: jnp.ndarray,
                    frame_id: jnp.ndarray, *, bkgd: bool, grid: int):
    """Evaluate a layer's field(s) on a ``grid``^3 lattice inside ``box`` and
    return the relu-sigma cube (G, G, G) as f16 (the host thresholds it —
    and the automatic-tau bound needs the values, not a fixed-tau mask;
    f16 halves the download through the tunneled TPU and its 2^-11 relative
    error is noise next to the sqrt(3) slack in the culling bound).

    ``net_params``: {"coarse": pytree, "fine": pytree or None,
    "motion": pytree or None} for ONE layer. ``box`` (2, 3) and ``frame_id``
    () are traced, so one compile serves every (frame, layer) of a kind.
    The cube is the union (elementwise max of relu sigma) over the coarse
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

    return sig.astype(jnp.float16)                   # (G, G, G)


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


def _slice_boxes(box: np.ndarray, occ: np.ndarray, axis: int, slices: int,
                 grid: int, pad: int) -> np.ndarray:
    """Host: split ``box``'s occupied span along ``axis`` into ``slices``
    index chunks and tighten each chunk's cross-axes extent -> (K, 2, 3).

    An empty chunk collapses to a zero-volume point box (slab test misses it;
    ``t_far > t_near`` is false at zero extent), placed at the chunk's center
    so fractional-frame box lerp stays local.
    """
    lo_i, hi_i, _ = _extent_from_cube(occ)
    span0, span1 = int(lo_i[axis]), int(hi_i[axis]) + 1
    bounds = np.linspace(span0, span1, slices + 1).round().astype(int)
    out = np.empty((slices, 2, 3), np.float32)
    for k in range(slices):
        a, b = bounds[k], max(bounds[k + 1], bounds[k] + 1)
        sub = np.take(occ, np.arange(a, min(b, grid)), axis=axis)
        s_lo, s_hi, any_occ = _extent_from_cube(sub)
        if any_occ:
            s_lo = s_lo.copy()
            s_hi = s_hi.copy()
            s_lo[axis] += a
            s_hi[axis] += a
            out[k] = _shrink(box, s_lo, s_hi, grid, pad)
        else:
            center = 0.5 * (_shrink(box, lo_i, hi_i, grid, pad).sum(0))
            voxel = (box[1] - box[0]) / grid
            center[axis] = box[0, axis] + 0.5 * (a + b) * voxel[axis]
            out[k] = np.stack([center, center])
    return out


def refine_scene_boxes(params: dict, spec: LayeredSpec, scene: SceneBoxes,
                       grid: int = 64, sigma_thresh: float = 1.0,
                       pad_voxels: int = 1,
                       refine_bkgd: bool = False,
                       slices: int = 1,
                       auto_tau_db: float | None = None) -> SceneBoxes:
    """Return ``scene`` with each per-frame performer box (and optionally the
    background box) shrunk to the trained field's occupied region.

    ``slices > 1`` additionally splits each refined box into ``slices``
    sub-boxes along the layer's dominant occupied axis (chosen once per layer
    so slices correspond across frames for the fractional-frame lerp),
    each tightened to its own cross-extent — ``scene.boxes`` then has shape
    ``(F, L, K, 2, 3)`` and the sampler intersects the union of slices
    (models/layered._coarse_sample): rays clipping an empty corner of the
    loose hull miss entirely (more per-tile kernel skips) and hitting rays
    get a tighter [enter, exit] interval, so the fixed sample budget lands
    on the matter. Exact at ``sigma_thresh=0``: every voxel is occupied,
    slices partition the box, and their union interval is the box's.

    Degenerate rows (zero boxes from ``FRAME_OFFSET`` padding) and layers
    with no occupancy above the threshold keep their original box — a
    mis-set threshold degrades to the exact baseline instead of deleting a
    performer (replicated across slices when ``slices > 1``).

    ``auto_tau_db`` (quality-bounded automatic threshold): when set,
    ``sigma_thresh`` is ignored and each (layer, frame) gets the LARGEST
    tau whose culled voxels' worst-case per-ray alpha — bounded from the
    sigma lattice itself, :func:`_culled_alpha_bound` — keeps worst-case
    image error above ``auto_tau_db`` dB PSNR (:func:`auto_tau`). With
    ``slices > 1`` the final union-of-slices culling is re-checked against
    the same budget per frame; a violating frame falls back to its hull box
    replicated across slices. No hand-tuned knob, and an operating point
    that can never ship out-of-spec geometry culling.
    """
    boxes = np.asarray(scene.boxes).copy()           # (F, L, 2, 3)
    F, L = boxes.shape[:2]
    K = max(1, int(slices))
    # The per-ray budget must COMPOSE across independently-refined fields:
    # a ray can cross every performer's culled region (and the background's
    # when refine_bkgd), each bounded separately, so each field gets an
    # equal share of the total alpha budget — otherwise L fields at the
    # full budget would ship 20*log10(L) dB below the floor.
    n_fields = max(L + (1 if refine_bkgd else 0), 1)
    eps = (_eps_alpha(auto_tau_db) / n_fields
           if auto_tau_db is not None else None)
    shrunk = total = 0
    taus: list[float] = []
    vol = lambda b: float(np.prod(np.maximum(b[1] - b[0], 0.0)))
    # default: original box replicated across slices (exact union)
    sliced = np.repeat(boxes[:, :, None], K, axis=2)  # (F, L, K, 2, 3)

    def sigma_cube(net, box, frame_id, bkgd=False):
        return np.asarray(_occupancy_cube(
            net, spec, jnp.asarray(box), jnp.float32(frame_id),
            bkgd=bkgd, grid=grid), np.float32)

    def pick_tau(sig, box):
        if eps is None:
            return float(sigma_thresh)
        tau, _ = auto_tau(sig, box, grid, pad_voxels, eps)
        taus.append(tau)
        return tau

    for layer in range(1, L + 1):
        net = _layer_net_params(params, spec, layer)
        cubes: dict[int, np.ndarray] = {}
        sigs: dict[int, np.ndarray] = {}
        for f in range(F):
            box = boxes[f, layer - 1]
            if not np.all(box[1] > box[0]):
                continue                             # FRAME_OFFSET zero row
            total += 1
            sig = sigma_cube(net, box, f + 1)
            tau_f = pick_tau(sig, box)
            occ = sig >= tau_f
            lo_i, hi_i, any_occ = _extent_from_cube(occ)
            if not any_occ:
                logger.warning(
                    "occupancy: layer %d frame %d has no sigma >= %.3g; "
                    "keeping the original box", layer, f + 1, tau_f)
                continue
            new = _shrink(box, lo_i, hi_i, grid, pad_voxels)
            if vol(new) < vol(box):
                shrunk += 1
            boxes[f, layer - 1] = new
            if K > 1:
                cubes[f] = occ
                sigs[f] = sig
        if K > 1 and cubes:
            # dominant occupied axis, summed in world units over frames
            lengths = np.zeros(3)
            for f, occ in cubes.items():
                lo_i, hi_i, _ = _extent_from_cube(occ)
                voxel = ((np.asarray(scene.boxes)[f, layer - 1, 1]
                          - np.asarray(scene.boxes)[f, layer - 1, 0]) / grid)
                lengths += (hi_i - lo_i + 1) * voxel
            axis = int(np.argmax(lengths))
            for f, occ in cubes.items():
                orig = np.asarray(scene.boxes)[f, layer - 1]
                if eps is None:
                    sliced[f, layer - 1] = _slice_boxes(orig, occ, axis, K,
                                                        grid, pad_voxels)
                    continue
                # Slice-specific automatic tau: slicing culls FAR more than
                # the hull trim at the same threshold (per-slice extents
                # tighten along every axis), so the hull-admissible tau is
                # usually way too aggressive here. Search the largest tau
                # whose union-of-sub-boxes culling bound fits the SAME
                # budget; a frame where none fits keeps its hull box.
                sub, tau_s, bound = auto_slice_tau(
                    sigs[f], orig, axis, K, grid, pad_voxels, eps)
                if sub is None:
                    logger.info(
                        "occupancy: layer %d frame %d: no slice tau fits "
                        "budget %.2e; keeping hull box", layer, f + 1, eps)
                    sliced[f, layer - 1] = np.repeat(
                        boxes[f, layer - 1][None], K, axis=0)
                    continue
                logger.info(
                    "occupancy: layer %d frame %d sliced at tau %.3g "
                    "(culling bound %.2e <= %.2e)", layer, f + 1, tau_s,
                    bound, eps)
                sliced[f, layer - 1] = sub

    bkgd_box = np.asarray(scene.bkgd_box)
    if refine_bkgd:
        sig = sigma_cube(_bkgd_net_params(params, spec), bkgd_box, 1.0,
                         bkgd=True)
        tau_b = pick_tau(sig, bkgd_box)
        lo_i, hi_i, any_occ = _extent_from_cube(sig >= tau_b)
        if any_occ:
            bkgd_box = _shrink(bkgd_box, lo_i, hi_i, grid, pad_voxels)

    if total:
        if eps is not None and taus:
            logger.info(
                "occupancy: tightened %d/%d performer boxes (grid %d, "
                "auto tau %.3g..%.3g for >= %.1f dB worst case, slices %d)",
                shrunk, total, grid, min(taus), max(taus), auto_tau_db, K)
        else:
            logger.info("occupancy: tightened %d/%d performer boxes "
                        "(grid %d, tau %.3g, slices %d)", shrunk, total,
                        grid, sigma_thresh, K)
    return SceneBoxes(bkgd_box=jnp.asarray(bkgd_box),
                      boxes=jnp.asarray(sliced if K > 1 else boxes),
                      bkgd_near_far=scene.bkgd_near_far)


def refined_boxes_cached(params: dict, spec: LayeredSpec, scene: SceneBoxes,
                         cache_dir: str, ckpt_path: str | None,
                         grid: int = 64, sigma_thresh: float = 1.0,
                         pad_voxels: int = 1,
                         refine_bkgd: bool = False,
                         slices: int = 1,
                         auto_tau_db: float | None = None) -> SceneBoxes:
    """Disk-cached :func:`refine_scene_boxes`.

    The cache key covers the checkpoint identity (path + mtime) and every
    refinement knob, so retraining or re-tuning never serves stale boxes.
    """
    tag = "none"
    if ckpt_path and os.path.exists(ckpt_path):
        tag = f"{os.path.basename(ckpt_path)}_{int(os.path.getmtime(ckpt_path))}"
    # "a2": auto-tau semantics v2 — the per-ray budget splits across the
    # independently-refined fields (and slices search their own tau), so
    # v1-cached boxes must not be served
    thresh_tag = (f"a2{auto_tau_db:g}" if auto_tau_db is not None
                  else f"{sigma_thresh:g}")
    name = (f"occ_boxes_{tag}_g{grid}_t{thresh_tag}_p{pad_voxels}"
            f"_b{int(refine_bkgd)}"
            + (f"_k{slices}" if slices > 1 else "") + ".npz")
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
                                 refine_bkgd=refine_bkgd,
                                 slices=slices,
                                 auto_tau_db=auto_tau_db)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(path, bkgd_box=np.asarray(refined.bkgd_box),
                 boxes=np.asarray(refined.boxes))
        logger.info("occupancy: cached boxes -> %s", path)
    except OSError:
        pass
    return refined
