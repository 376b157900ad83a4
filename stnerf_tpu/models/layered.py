"""The layered spatio-temporal radiance field — TPU-native core.

This is the counterpart of the reference's ``LayeredRFRender``
(ref: modeling/layered_rfrender.py:19-735), redesigned as one pure,
trace-once function over static shapes:

* **One ray format.** The reference switches between packed ray layouts at
  runtime (6 / +cam / +frame / +per-layer-frame "retiming" columns, ref:
  modeling/layered_rfrender.py:144-181). Here every ray always carries a
  per-layer frame-id vector ``frame_ids (N, L+1)``; the non-retimed case is
  the same id broadcast to all layers, and fractional ids (retiming) are
  handled by interpolation that is exact at integers. One code path, no
  data-dependent Python branching under ``jit``.
* **Masking instead of ragged gather.** The reference boolean-indexes rays
  that hit each layer's bbox (ref: layered_rfrender.py:400-413) — dynamic
  shapes XLA cannot compile. We evaluate all rays for all layers (performer
  fields are *stacked* and evaluated through one ``vmap``-batched MLP, which
  maps onto large MXU matmuls) and zero the density of misses. Same math,
  static shapes.
* **Edits are data, not mutation.** hide/show, per-layer shift/scale/alpha,
  near clip and density thresholds form an ``EditState`` pytree argument —
  replacing the reference's mutable model attributes (ref:
  layered_rfrender.py:39-42, 104-127) — so an edited render is just a
  different input, not a recompiled or mutated model.

Behavioral notes (quirks preserved / fixed — see SURVEY.md §7):
* density thresholds are applied unconditionally (default 0 is a no-op,
  exactly equivalent to the reference's retiming-only application),
* per-layer alpha generalizes the reference's hardcoded ``layer == 2``
  fade (ref: layered_rfrender.py:575-576),
* hiding layer 0 actually hides the background (the reference silently
  ignores it, ref: layered_rfrender.py:401 only guards performer layers),
* the NEAR_FAR sampling path works for the layered model (the reference's
  is broken: ref: layered_rfrender.py:120-121 typo and :676-683 returns
  zeros),
* ray gradients are not severed before sampling, so POSE_REFINEMENT trains
  under BBOX sampling too (the reference detaches rays there, ref:
  layered_rfrender.py:270-315).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sampling import (MISS_T, ray_aabb_intersect, sample_pdf,
                            stratified_between, stratified_near_far,
                            stratified_union)
from ..ops.volume import (composite_merged_nosort, composite_streams_nosort,
                          merge_layers_planar, sort_merge_t,
                          sort_samples_planar, volume_render_planar)
from .camera import apply_camera_transform, init_camera_transform
from .motionnet import MotionNetSpec, apply_motionnet_planar, init_motionnet
from .spacenet import SpaceNetSpec, apply_spacenet_planar, init_spacenet


# ---------------------------------------------------------------------------
# Static specification
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LayeredSpec:
    """Hashable static configuration of the layered model (jit-static)."""

    layer_num: int = 2                 # performer layers; total fields = L+1
    coarse_samples: int = 90
    fine_samples: int = 30
    sample_method: str = "BBOX"        # "BBOX" | "NEAR_FAR"
    boarder_weight: float = 1e10
    same_spacenet: bool = False
    include_input: bool = True
    use_dir: bool = True
    use_space_time: bool = False
    bkgd_use_space_time: bool = False
    use_deform_time: bool = False
    bkgd_use_deform_time: bool = False
    use_deform_view: bool = False
    pose_refinement: bool = False
    deep_rgb: bool = False
    backbone_dim: int = 256
    head_dim: int = 128
    motion_dim: int = 128
    camera_num: int = 0
    compute_dtype: str = "float32"     # matmul dtype ("bfloat16" | "float32")
    use_pallas: bool = False           # fused field-eval kernel (TPU only)
    trainable_kernel: bool = False     # Pallas fwd+bwd SpaceNet in training
    nosort_composite: bool = False     # sort-free merged compositor: the
    # cross-layer lax.sort's VJP is ~10x its forward on TPU (inverse-
    # permutation lane gathers), so training swaps in the factorized-
    # transmittance equivalent (ops.volume.composite_merged_nosort)
    fast_fine: bool = False            # opacity-driven fast fine stage
    # (approximation; the trainer strips it unless fast_fine_train): fine
    # nets evaluate ONLY the S2 new importance samples — coarse positions
    # reuse the coarse nets' outputs — and a performer with ~zero coarse
    # opacity on a ray skips its fine kernel there. Exact when fine nets
    # equal coarse nets; the golden path keeps the reference's full union
    # re-evaluation (ref: modeling/layered_rfrender.py:481-606).
    fine_skip_eps: float = 1e-3        # coarse-opacity cutoff for the
    # per-ray performer fine skip (only read when fast_fine)
    fast_fine_train: bool = False      # opt-in: keep fast_fine in TRAINING
    # too (the fine loss then trains fine nets only at the new importance
    # positions; carried coarse contributions backprop into the coarse
    # nets). With nosort_composite the carried/new streams composite
    # sort-free (lax.sort's payload VJP is ~10x its forward on TPU).
    compositor_kernel: bool = False    # Pallas cross-transmittance kernels
    # in the nosort compositor (kernels/cross_trans.py): rebuild the
    # precedence masks in VMEM instead of HBM einsum cubes. Same semantics,
    # reassociated sums; the XLA cube path stays the golden form.
    coarse_exit_segments: int = 0      # transmittance-driven early exit in
    # the coarse march (inference-only approximation; the trainer strips
    # it): evaluate the S1 samples front-to-back in this many sequential
    # dispatches, and after each one skip (per kernel tile) the rays where a
    # layer's own transmittance has saturated below coarse_exit_eps — its
    # remaining samples could contribute at most eps to any output. 0/1 =
    # exact single dispatch (golden; the reference marches every sample,
    # ref: modeling/layered_rfrender.py:382-413).
    coarse_exit_eps: float = 1e-3      # transmittance cutoff for the skip
    occ_gap_skip: bool = False         # within-union gap skipping: when the
    # scene carries occupancy sub-box slices (render/occupancy.py,
    # TPU.OCC_SLICES > 1), allocate each performer's coarse samples over
    # the UNION MEASURE of its hit slice intervals instead of the hull
    # [min enter, max exit] — samples skip the empty gaps between slices
    # and densify on the matter (ops.sampling.stratified_union). Inert
    # without sliced boxes (training always gets plain boxes). Exact when
    # the slices tile the box (occupancy tau=0): the union is one
    # contiguous interval (fp-level, not bitwise).

    @classmethod
    def from_cfg(cls, cfg, camera_num: int = 0) -> "LayeredSpec":
        m = cfg.MODEL
        return cls(
            layer_num=cfg.DATASETS.LAYER_NUM,
            coarse_samples=m.COARSE_RAY_SAMPLING,
            fine_samples=m.FINE_RAY_SAMPLING,
            sample_method=m.SAMPLE_METHOD,
            boarder_weight=float(m.BOARDER_WEIGHT),
            same_spacenet=m.SAME_SPACENET,
            include_input=m.TKERNEL_INC_RAW,
            use_dir=m.USE_DIR,
            use_space_time=m.USE_SPACE_TIME,
            bkgd_use_space_time=m.BKGD_USE_SPACE_TIME,
            use_deform_time=m.USE_DEFORM_TIME,
            bkgd_use_deform_time=m.BKGD_USE_DEFORM_TIME,
            use_deform_view=m.USE_DEFORM_VIEW,
            pose_refinement=m.POSE_REFINEMENT,
            # matches ref: modeling/layered_rfrender.py:35
            deep_rgb=(m.DEEP_RGB and m.USE_SPACE_TIME),
            backbone_dim=m.BACKBONE_DIM,
            head_dim=m.HEAD_DIM,
            motion_dim=m.MOTION_DIM,
            camera_num=camera_num,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            use_pallas=cfg.TPU.USE_PALLAS,
            trainable_kernel=cfg.TPU.TRAINABLE_KERNEL,
            fast_fine=cfg.TPU.FAST_FINE,
            fine_skip_eps=float(cfg.TPU.FAST_FINE_EPS),
            fast_fine_train=cfg.TPU.FAST_FINE_TRAIN,
            compositor_kernel=cfg.TPU.COMPOSITOR_KERNEL,
            coarse_exit_segments=int(cfg.TPU.EARLY_EXIT_SEGMENTS),
            coarse_exit_eps=float(cfg.TPU.EARLY_EXIT_EPS),
            occ_gap_skip=cfg.TPU.OCC_GAP_SKIP,
        )

    def spacenet_spec(self, bkgd: bool) -> SpaceNetSpec:
        return SpaceNetSpec(
            use_dir=self.use_dir,
            use_time=self.bkgd_use_space_time if bkgd else self.use_space_time,
            deep_rgb=self.deep_rgb,
            include_input=self.include_input,
            backbone_dim=self.backbone_dim,
            head_dim=self.head_dim,
        )

    def motion_spec(self, input_time: bool) -> MotionNetSpec:
        return MotionNetSpec(c_input=4, include_input=self.include_input,
                             width=self.motion_dim, input_time=input_time)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None


# ---------------------------------------------------------------------------
# Pytrees
# ---------------------------------------------------------------------------

class RayInputs(NamedTuple):
    """A batch of rays. All leaves have leading dim N."""
    rays_o: jnp.ndarray     # (N, 3)
    rays_d: jnp.ndarray     # (N, 3)
    frame_ids: jnp.ndarray  # (N, L+1) float, 1-based frame id per layer
    cam_ids: jnp.ndarray    # (N,) float camera ids (0 if unused)
    near_far: jnp.ndarray   # (N, 2) per-ray near/far (NEAR_FAR method)


class SceneBoxes(NamedTuple):
    """Per-scene geometry constants, device resident."""
    bkgd_box: jnp.ndarray       # (2, 3) min/max
    boxes: jnp.ndarray          # (F, L, 2, 3) per-frame per-performer min/max
    bkgd_near_far: jnp.ndarray  # (2,) background near/far (NEAR_FAR method)


class EditState(NamedTuple):
    """All render-time edits as data (replaces the reference's mutable model
    attributes; ref: layered_rfrender.py:39-42, 104-112, 230-243)."""
    visible: jnp.ndarray   # (L+1,) 1.0 shown / 0.0 hidden
    shift: jnp.ndarray     # (L+1, 3)
    scale: jnp.ndarray     # (L+1,)
    alpha: jnp.ndarray     # (L+1,) density fade (fine stage, performers)
    near: jnp.ndarray      # () near clip
    density_threshold: jnp.ndarray       # () performer sigma cutoff
    bkgd_density_threshold: jnp.ndarray  # () background sigma cutoff (fine)
    scale_pivot: jnp.ndarray             # (3,) pivot for the scale edit

    @classmethod
    def identity(cls, layer_num: int, scale_pivot=None) -> "EditState":
        lp1 = layer_num + 1
        return cls(
            visible=jnp.ones((lp1,), jnp.float32),
            shift=jnp.zeros((lp1, 3), jnp.float32),
            scale=jnp.ones((lp1,), jnp.float32),
            alpha=jnp.ones((lp1,), jnp.float32),
            near=jnp.zeros((), jnp.float32),
            density_threshold=jnp.zeros((), jnp.float32),
            bkgd_density_threshold=jnp.zeros((), jnp.float32),
            scale_pivot=(jnp.zeros((3,), jnp.float32)
                         if scale_pivot is None else jnp.asarray(scale_pivot, jnp.float32)),
        )


class LayerOutputs(NamedTuple):
    color: jnp.ndarray  # (..., N, 3)
    depth: jnp.ndarray  # (..., N, 1)
    acc: jnp.ndarray    # (..., N, 1)


class RenderOutputs(NamedTuple):
    fine: LayerOutputs          # mixed fine composite
    coarse: LayerOutputs        # mixed coarse composite
    fine_layers: LayerOutputs   # per-layer, leading dim L+1
    coarse_layers: LayerOutputs
    hit: jnp.ndarray            # (L+1, N) bool bbox-hit mask


def compute_scale_pivot(bkgd_box: jnp.ndarray, boxes_frame0: jnp.ndarray) -> jnp.ndarray:
    """Pivot used by the scale edit.

    Reproduces the reference's choice (ref: layered_rfrender.py:216-232): the
    mean of performer layers 1 and 2's frame-0 bbox centers, with the z
    component taken from the bbox *minimum* (the in-tree "spider" hack at
    :226). With a single performer layer, its own center is used.
    """
    boxes_frame0 = jnp.asarray(boxes_frame0)
    centers = 0.5 * (boxes_frame0[:, 0] + boxes_frame0[:, 1])  # (L, 3)
    centers = centers.at[:, 2].set(boxes_frame0[:, 0, 2])       # z <- min z
    if boxes_frame0.shape[0] >= 2:
        return 0.5 * (centers[0] + centers[1])
    return centers[0]


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("spec",))
def init_layered_params(key: jax.Array, spec: LayeredSpec) -> dict:
    """Initialize the full parameter pytree.

    Mirrors the reference's init sharing: every performer layer starts as a
    copy of layer 0's net, and fine nets start equal to coarse (or aliased
    when SAME_SPACENET; ref: modeling/layered_rfrender.py:59-93).
    Jitted whole: one compile instead of hundreds of per-op dispatches.
    """
    kb, kl, km, kbm, kv = jax.random.split(key, 5)
    L = spec.layer_num

    bkgd = init_spacenet(kb, spec.spacenet_spec(bkgd=True))
    layer0 = init_spacenet(kl, spec.spacenet_spec(bkgd=False))
    layers = jax.tree.map(lambda x: jnp.stack([x] * L), layer0) if L else {}

    params = {
        "bkgd_coarse": bkgd,
        "bkgd_fine": jax.tree.map(jnp.copy, bkgd),
        "layers_coarse": layers,
    }
    if not spec.same_spacenet:
        params["layers_fine"] = jax.tree.map(jnp.copy, layers)

    if spec.use_deform_time and L:
        m0 = init_motionnet(km, spec.motion_spec(input_time=True))
        params["motion"] = jax.tree.map(lambda x: jnp.stack([x] * L), m0)
    if spec.bkgd_use_deform_time:
        params["bkgd_motion"] = init_motionnet(kbm, spec.motion_spec(input_time=False))
    if spec.use_deform_view:
        params["view_deform"] = init_motionnet(kv, spec.motion_spec(input_time=False))
    if spec.pose_refinement:
        params["cam_pose"] = init_camera_transform(max(spec.camera_num, 1))
    return params


# ---------------------------------------------------------------------------
# Rendering core
# ---------------------------------------------------------------------------

def _gather_boxes(scene: SceneBoxes, frame_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-ray, per-performer bbox with linear interpolation at fractional
    frame ids (exact gather at integers; ref: layered_rfrender.py:123-127,193).

    frame_ids: (N, L) 1-based -> (N, L, 2, 3), or (N, L, K, 2, 3) when the
    scene carries occupancy sub-boxes (render/occupancy.py ``slices > 1``;
    slice index corresponds across frames, so the lerp stays per-slice).
    """
    F = scene.boxes.shape[0]
    idx = frame_ids - 1.0
    lo = jnp.clip(jnp.floor(idx), 0, F - 1)
    hi = jnp.clip(lo + 1, 0, F - 1)
    w = jnp.clip(idx - lo, 0.0, 1.0)[..., None, None]
    if scene.boxes.ndim == 5:
        w = w[..., None]
    li = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)
    lidx = jnp.arange(scene.boxes.shape[1])[None, :]
    b_lo = scene.boxes[li, lidx]  # (N, L, [K,] 2, 3)
    b_hi = scene.boxes[hi, lidx]
    return (1.0 - w) * b_lo + w * b_hi


def _edit_boxes(boxes: jnp.ndarray, edits: EditState) -> jnp.ndarray:
    """Forward transform of layer bboxes by the scale/shift edits
    (ref: layered_rfrender.py:230-243). boxes: (N, L+1, [K,] 2, 3) — the
    optional K axis carries occupancy sub-boxes (render/occupancy.py)."""
    pivot = edits.scale_pivot
    if boxes.ndim == 5:  # sub-box slice axis
        s = edits.scale[None, :, None, None, None]
        shift = edits.shift[None, :, None, None, :]
    else:
        s = edits.scale[None, :, None, None]
        shift = edits.shift[None, :, None, :]
    boxes = (boxes - pivot) * s + pivot
    return boxes + shift


def _inverse_edit_points(xyz: jnp.ndarray, edits: EditState) -> jnp.ndarray:
    """Map edited-space sample points back into each layer's canonical field
    space (ref: layered_rfrender.py:293-303).

    Planar layout: xyz is (L+1, 3, N, S) — channels lead so no TPU tile
    padding on the coordinate axis.
    """
    xyz = xyz - edits.shift[:, :, None, None]
    pivot = edits.scale_pivot[None, :, None, None]
    s = edits.scale[:, None, None, None]
    return (xyz - pivot) / s + pivot


def _use_trainable_kernel(spec: LayeredSpec) -> bool:
    """Hand-differentiated fused SpaceNet path (kernels.spacenet_vjp). The
    kernel emits position- AND direction-encoding gradients, so MotionNet
    and POSE_REFINEMENT both train on the fast path."""
    return spec.trainable_kernel and jax.default_backend() == "tpu"


def _use_trainable_fused(spec: LayeredSpec) -> bool:
    """Fully-fused trainable path (kernels.field_vjp): MotionNet +
    encodings + SpaceNet fwd AND bwd in Pallas. The (rare) view-deform net
    falls back to the staged trainable path, where _deform runs in XLA."""
    return (spec.trainable_kernel and not spec.use_deform_view
            and jax.default_backend() == "tpu")


def _use_compositor_kernel(spec: LayeredSpec) -> bool:
    """Pallas cross-transmittance path of the nosort compositor (TPU only;
    the XLA cube path is the golden form and the CPU/test fallback)."""
    return spec.compositor_kernel and jax.default_backend() == "tpu"


def _use_fused_kernel(spec: LayeredSpec) -> bool:
    """The fully-fused Pallas path handles per-layer time deformation inside
    the kernel; the (rare) view-deform net falls back to the XLA path."""
    return (spec.use_pallas and not spec.use_deform_view
            and jax.default_backend() == "tpu")


def _eval_fields_fused(params: dict, spec: LayeredSpec, xyz: jnp.ndarray,
                       dirs_p: jnp.ndarray, frame_ids: jnp.ndarray, fine: bool,
                       active=None, ray_hit=None):
    """Fully-fused field evaluation (kernels.fused_field): the per-layer
    MotionNet displacement, all positional encodings and the SpaceNet run in
    one VMEM-resident Pallas kernel per field. xyz here is *pre-deformation*
    canonical positions (L+1, 3, N, S); dirs_p (3, N).

    ``active`` ((L+1,) bool or None): chunk-level skip — a performer field
    whose bbox no ray in this chunk hits (or that is hidden) is skipped with
    ``lax.cond``, returning zeros. ``ray_hit`` ((L+1, N) bool or None)
    refines that to per-KERNEL-TILE skip flags (~8-21 rays per tile): image
    chunks are spatially coherent tile-ordered rays, so a chunk that
    partially overlaps a performer only pays for the rays that can see it.
    Together these are the TPU-legal analogue of the reference's per-ray
    boolean indexing (ref: layered_rfrender.py:400-413).
    """
    from ..kernels.fused_field import fused_field, prepare_motion_params_planar
    from ..kernels.fused_spacenet import prepare_kernel_params_planar
    from ..ops.encoding import positional_encoding_planar as pe

    lp1, _, N, S = xyz.shape
    M = N * S
    dt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32
    inc = spec.include_input
    sn_b = spec.spacenet_spec(bkgd=True)
    sn_l = spec.spacenet_spec(bkgd=False)

    if spec.use_dir:
        dir_enc = pe(dirs_p, sn_b.dir_freqs, inc).astype(dt)  # (dir_dim, N)
        dir_b = jnp.broadcast_to(dir_enc[:, :, None],
                                 (dir_enc.shape[0], N, S)).reshape(-1, M)
    else:
        # matches prepare_kernel_params_planar's (1, W) dummy r1b operand
        dir_b = jnp.zeros((1, M), dt)

    TILE = 2048  # fused_field's default inference tile
    mp_pad = -(-M // TILE) * TILE

    def tile_flags(hit_l):
        if hit_l is None:
            return None
        hs = jnp.broadcast_to(hit_l[:, None], (N, S)).reshape(-1)
        if mp_pad != M:
            hs = jnp.concatenate([hs, jnp.zeros((mp_pad - M,), bool)])
        return jnp.any(hs.reshape(-1, TILE), axis=-1).astype(jnp.int32)

    def run(net_params, motion_params, motion_mode, sspec, x, t_ids,
            flags=None):
        kp = prepare_kernel_params_planar(net_params, sspec, dt)
        mp = (prepare_motion_params_planar(motion_params, dt)
              if motion_mode else ())
        ids = jnp.broadcast_to(t_ids[:, None], (N, S)).reshape(1, M)
        rgb, sig = fused_field(kp, mp, sspec, x.reshape(3, M), ids, dir_b,
                               motion_mode=motion_mode,
                               compute_dtype=spec.compute_dtype,
                               tile=TILE, tile_flags=flags)
        return rgb.reshape(3, N, S), sig.reshape(N, S)

    bkgd_key = "bkgd_fine" if fine else "bkgd_coarse"
    bkgd_motion = ("direct" if spec.bkgd_use_deform_time else None)
    # the background field takes tile flags too: bbox misses are rare for
    # it, but the early-exit coarse march (render_rays) passes shrinking
    # per-ray keeps where its transmittance has saturated — the background
    # is the one field every ray pays for, so that is where the exit wins
    rgb0, sig0 = run(params[bkgd_key], params.get("bkgd_motion"), bkgd_motion,
                     sn_b, xyz[0], frame_ids[:, 0],
                     tile_flags(None if ray_hit is None else ray_hit[0]))
    rgbs, sigs = [rgb0], [sig0]

    if spec.layer_num:
        if fine and not spec.same_spacenet:
            layer_params = params["layers_fine"]
        else:
            layer_params = params["layers_coarse"]
        layer_motion = "lerp" if spec.use_deform_time else None
        for i in range(spec.layer_num):  # static, small: separate kernels
            p_i = jax.tree.map(lambda x: x[i], layer_params)
            m_i = (jax.tree.map(lambda x: x[i], params["motion"])
                   if layer_motion else None)

            flags_i = tile_flags(None if ray_hit is None else ray_hit[i + 1])

            def eval_layer(operands, p_i=p_i, m_i=m_i, flags_i=flags_i):
                x, t_ids = operands
                return run(p_i, m_i, layer_motion, sn_l, x, t_ids, flags_i)

            def skip_layer(operands):
                return (jnp.zeros((3, N, S), jnp.float32),
                        jnp.zeros((N, S), jnp.float32))

            if active is None:
                r, s = eval_layer((xyz[i + 1], frame_ids[:, i + 1]))
            else:
                r, s = jax.lax.cond(active[i + 1], eval_layer, skip_layer,
                                    (xyz[i + 1], frame_ids[:, i + 1]))
            rgbs.append(r)
            sigs.append(s)
    return jnp.stack(rgbs), jnp.stack(sigs)


def _eval_fields_trainable_fused(params: dict, spec: LayeredSpec,
                                 xyz: jnp.ndarray, dirs_p: jnp.ndarray,
                                 frame_ids: jnp.ndarray, fine: bool,
                                 active=None, ray_hit=None):
    """Fully-fused training-path field evaluation (kernels.field_vjp):
    per-layer MotionNet, all positional encodings and the SpaceNet run
    inside one Pallas kernel per field — forward and backward. xyz here is
    *pre-deformation* canonical positions (L+1, 3, N, S). Gradients flow to
    the field weights, the motion weights, xyz (POSE_REFINEMENT origin/dir
    signal) and the direction encoding."""
    from ..kernels.field_vjp import field_planar_trainable
    from ..ops.encoding import positional_encoding_planar as pe

    lp1, _, N, S = xyz.shape
    M = N * S
    inc = spec.include_input
    sn_b = spec.spacenet_spec(bkgd=True)
    sn_l = spec.spacenet_spec(bkgd=False)

    if spec.use_dir:
        dir_enc = pe(dirs_p, sn_b.dir_freqs, inc, recursive=True)
        dir_b = jnp.broadcast_to(dir_enc[:, :, None],
                                 (dir_enc.shape[0], N, S)).reshape(-1, M)
    else:
        dir_b = jnp.zeros((1, M), jnp.float32)

    TILE = 1024
    mp = -(-M // TILE) * TILE

    def tile_flags(hit_l):
        # per-tile any-hit: with the batch sorted by hit pattern
        # (engine/trainer.sort_batch_by_hit) tiles are hit-homogeneous and
        # a miss-heavy batch skips most of a performer field's MXU work.
        # Exact: downstream _mask_sigma_* zeroes missed rays' densities, so
        # skipped tiles' zero outputs and zero gradients match the full
        # computation after masking.
        if hit_l is None:
            return None
        hs = jnp.broadcast_to(hit_l[:, None], (N, S)).reshape(-1)
        if mp != M:
            hs = jnp.concatenate([hs, jnp.zeros((mp - M,), bool)])
        return jnp.any(hs.reshape(-1, TILE), axis=-1).astype(jnp.int32)

    def run(net_params, motion_params, motion_mode, sspec, x, t_ids,
            flags=None):
        ids = jnp.broadcast_to(t_ids[:, None], (N, S)).reshape(1, M)
        # custom_vjp call: positional args only (no kwargs support)
        rgb, sig = field_planar_trainable(net_params, motion_params,
                                          x.reshape(3, M), ids, dir_b,
                                          flags, sspec, motion_mode,
                                          spec.compute_dtype, False, TILE)
        return rgb.reshape(3, N, S), sig.reshape(N, S)

    bkgd_key = "bkgd_fine" if fine else "bkgd_coarse"
    bkgd_motion = "direct" if spec.bkgd_use_deform_time else None
    rgb0, sig0 = run(params[bkgd_key], params.get("bkgd_motion"), bkgd_motion,
                     sn_b, xyz[0], frame_ids[:, 0])
    rgbs, sigs = [rgb0], [sig0]
    if spec.layer_num:
        if fine and not spec.same_spacenet:
            layer_params = params["layers_fine"]
        else:
            layer_params = params["layers_coarse"]
        layer_motion = "lerp" if spec.use_deform_time else None
        for i in range(spec.layer_num):
            p_i = jax.tree.map(lambda x: x[i], layer_params)
            m_i = (jax.tree.map(lambda x: x[i], params["motion"])
                   if layer_motion else None)

            flags_i = tile_flags(None if ray_hit is None else ray_hit[i + 1])

            def eval_layer(operands, p_i=p_i, m_i=m_i, flags_i=flags_i):
                x, t_ids = operands
                return run(p_i, m_i, layer_motion, sn_l, x, t_ids, flags_i)

            def skip_layer(operands):
                return (jnp.zeros((3, N, S), jnp.float32),
                        jnp.zeros((N, S), jnp.float32))

            if active is None:
                r, s_ = eval_layer((xyz[i + 1], frame_ids[:, i + 1]))
            else:
                r, s_ = jax.lax.cond(active[i + 1], eval_layer, skip_layer,
                                     (xyz[i + 1], frame_ids[:, i + 1]))
            rgbs.append(r)
            sigs.append(s_)
    return jnp.stack(rgbs), jnp.stack(sigs)


def _eval_fields_trainable(params: dict, spec: LayeredSpec, xyz: jnp.ndarray,
                           dirs_p: jnp.ndarray, frame_ids: jnp.ndarray,
                           fine: bool, active=None):
    """Training-path field evaluation through the hand-differentiated fused
    SpaceNet kernel (kernels.spacenet_vjp): encodings in XLA (differentiable,
    so MotionNet gradients flow through the displaced positions), the MLP
    forward AND backward as Pallas kernels. Staged fallback for flag combos
    the fully-fused kernel excludes (view-deform); xyz is post-deformation
    here."""
    from ..kernels.spacenet_vjp import spacenet_planar_trainable
    from ..ops.encoding import positional_encoding_planar as pe

    lp1, _, N, S = xyz.shape
    M = N * S
    inc = spec.include_input
    sn_b = spec.spacenet_spec(bkgd=True)
    sn_l = spec.spacenet_spec(bkgd=False)

    if spec.use_dir:
        dir_enc = pe(dirs_p, sn_b.dir_freqs, inc, recursive=True)
        dir_b = jnp.broadcast_to(dir_enc[:, :, None],
                                 (dir_enc.shape[0], N, S)).reshape(-1, M)
    else:
        # matches the kernel's dummy (1, out) zero r1b operand
        dir_b = jnp.zeros((1, M), jnp.float32)

    def run(net_params, sspec, x, t_ids):
        pos = pe(x.reshape(3, M), sspec.pos_freqs, inc, recursive=True)
        te = None
        if sspec.use_time:
            t1 = pe(t_ids[None, :], sspec.time_freqs, inc,
                    recursive=True)  # (time_dim, N)
            te = jnp.broadcast_to(t1[:, :, None], (t1.shape[0], N, S)).reshape(-1, M)
        rgb, sig = spacenet_planar_trainable(net_params, sspec, pos, dir_b, te,
                                             spec.compute_dtype)
        return rgb.reshape(3, N, S), sig.reshape(N, S)

    bkgd_key = "bkgd_fine" if fine else "bkgd_coarse"
    rgb0, sig0 = run(params[bkgd_key], sn_b, xyz[0], frame_ids[:, 0])
    rgbs, sigs = [rgb0], [sig0]
    if spec.layer_num:
        if fine and not spec.same_spacenet:
            layer_params = params["layers_fine"]
        else:
            layer_params = params["layers_coarse"]
        for i in range(spec.layer_num):
            p_i = jax.tree.map(lambda x: x[i], layer_params)

            def eval_layer(operands, p_i=p_i):
                x, t_ids = operands
                return run(p_i, sn_l, x, t_ids)

            def skip_layer(operands):
                return (jnp.zeros((3, N, S), jnp.float32),
                        jnp.zeros((N, S), jnp.float32))

            if active is None:
                r, s_ = eval_layer((xyz[i + 1], frame_ids[:, i + 1]))
            else:
                r, s_ = jax.lax.cond(active[i + 1], eval_layer, skip_layer,
                                     (xyz[i + 1], frame_ids[:, i + 1]))
            rgbs.append(r)
            sigs.append(s_)
    return jnp.stack(rgbs), jnp.stack(sigs)


def _eval_fields(params: dict, spec: LayeredSpec, xyz: jnp.ndarray,
                 dirs_p: jnp.ndarray, frame_ids: jnp.ndarray, fine: bool,
                 active=None, ray_hit=None):
    """Evaluate background + stacked performer fields.

    Planar layout: xyz (L+1, 3, N, S) canonical-space samples, dirs_p (3, N),
    frame_ids (N, L+1). Returns rgb (L+1, 3, N, S), sigma (L+1, N, S).
    ``ray_hit`` ((L+1, N) bool, optional): per-ray bbox hits — the
    trainable-fused path turns them into per-tile kernel skip flags.
    """
    if _use_fused_kernel(spec):
        return _eval_fields_fused(params, spec, xyz, dirs_p, frame_ids, fine,
                                  active=active, ray_hit=ray_hit)
    if _use_trainable_fused(spec):
        return _eval_fields_trainable_fused(params, spec, xyz, dirs_p,
                                            frame_ids, fine, active=active,
                                            ray_hit=ray_hit)
    if _use_trainable_kernel(spec):
        return _eval_fields_trainable(params, spec, xyz, dirs_p, frame_ids,
                                      fine, active=active)
    _, _, N, S = xyz.shape
    dt = spec.dtype
    dirs_b = jnp.broadcast_to(dirs_p[:, :, None], (3, N, S))

    bkgd_key = "bkgd_fine" if fine else "bkgd_coarse"
    bkgd_t = (jnp.broadcast_to(frame_ids[:, 0][:, None], (N, S))
              if spec.bkgd_use_space_time else None)
    rgb0, sig0 = apply_spacenet_planar(params[bkgd_key],
                                       spec.spacenet_spec(bkgd=True),
                                       xyz[0], dirs_b, bkgd_t, dt)

    if spec.layer_num == 0:
        return rgb0[None], sig0[None]

    if fine and not spec.same_spacenet:
        layer_params = params["layers_fine"]
    else:
        layer_params = params["layers_coarse"]
    l_spec = spec.spacenet_spec(bkgd=False)
    l_times = (jnp.broadcast_to(frame_ids.T[1:, :, None], (spec.layer_num, N, S))
               if spec.use_space_time else None)

    def one_layer(p, x, t):
        return apply_spacenet_planar(p, l_spec, x, dirs_b, t, dt)

    in_axes = (0, 0, 0 if l_times is not None else None)
    rgb_l, sig_l = jax.vmap(one_layer, in_axes=in_axes)(layer_params, xyz[1:], l_times)
    return (jnp.concatenate([rgb0[None], rgb_l], axis=0),
            jnp.concatenate([sig0[None], sig_l], axis=0))


def _deform(params: dict, spec: LayeredSpec, xyz: jnp.ndarray,
            frame_ids: jnp.ndarray, cam_ids: jnp.ndarray) -> jnp.ndarray:
    """Apply view/time deformation flows to sample points.

    xyz: (L+1, 3, N, S) planar. Performer layers use their own MotionNet with
    the per-layer frame id (ref: layered_rfrender.py:340-368); the background
    optionally has its own; the view-deform net applies to every layer with
    the camera id (ref: layered_rfrender.py:323-329).
    """
    lp1, _, N, S = xyz.shape
    dt = spec.dtype
    rec = _use_trainable_kernel(spec)  # recursion trig on the TPU hot path

    if spec.use_deform_view:
        v_spec = spec.motion_spec(input_time=False)
        ids = jnp.broadcast_to(cam_ids[None, :, None], (lp1, N, S))
        flow = jax.vmap(lambda x, t: apply_motionnet_planar(
            params["view_deform"], v_spec, x, t, dt, rec))(xyz, ids)
        xyz = xyz + flow

    if spec.use_deform_time and spec.layer_num:
        m_spec = spec.motion_spec(input_time=True)
        ids = jnp.broadcast_to(frame_ids.T[1:, :, None], (spec.layer_num, N, S))
        flow = jax.vmap(lambda p, x, t: apply_motionnet_planar(p, m_spec, x, t,
                                                               dt, rec)
                        )(params["motion"], xyz[1:], ids)
        xyz = xyz.at[1:].add(flow)

    if spec.bkgd_use_deform_time:
        b_spec = spec.motion_spec(input_time=False)
        ids = jnp.broadcast_to(frame_ids[:, 0][:, None], (N, S))
        flow = apply_motionnet_planar(params["bkgd_motion"], b_spec, xyz[0],
                                      ids, dt, rec)
        xyz = xyz.at[0].add(flow)
    return xyz


def _coarse_sample(spec: LayeredSpec, scene: SceneBoxes, inputs: RayInputs,
                   boxes_all: jnp.ndarray, key):
    """Sample the coarse t's for every layer. Returns (t (L+1,N,S1), hit (L+1,N))."""
    N = inputs.rays_o.shape[0]
    lp1 = spec.layer_num + 1
    S1 = spec.coarse_samples

    if spec.sample_method == "NEAR_FAR":
        keys = jax.random.split(key, lp1) if key is not None else [None] * lp1
        t_b = stratified_near_far(jnp.full((N,), scene.bkgd_near_far[0]),
                                  jnp.full((N,), scene.bkgd_near_far[1]), S1, keys[0])
        ts = [t_b] + [stratified_near_far(inputs.near_far[:, 0], inputs.near_far[:, 1],
                                          S1, keys[i + 1])
                      for i in range(spec.layer_num)]
        return jnp.stack(ts), jnp.ones((lp1, N), bool)

    # BBOX: slab test per layer, stratified bins between entry and exit.
    if boxes_all.ndim == 5:
        # occupancy sub-box slices (N, L+1, K, 2, 3): intersect each slice
        # and take the union interval [min enter, max exit] over hit slices.
        # Rays that clip only the empty corners of the loose hull now miss
        # (more per-tile kernel skips); hitting rays get a tighter interval
        # so the fixed sample budget lands on the matter. Exact when the
        # slices tile the original box (render/occupancy.py, tau=0): the
        # union interval is bitwise the single-box interval (same binding
        # slab planes).
        K = boxes_all.shape[2]
        o_b = jnp.broadcast_to(inputs.rays_o[:, None, None, :], (N, lp1, K, 3))
        d_b = jnp.broadcast_to(inputs.rays_d[:, None, None, :], (N, lp1, K, 3))
        t_n, t_f, h = ray_aabb_intersect(o_b, d_b, boxes_all[..., 0, :],
                                         boxes_all[..., 1, :])  # (N, L+1, K)
        big = jnp.asarray(3.4e38, t_n.dtype)
        hit = jnp.any(h, axis=2)
        t_near = jnp.min(jnp.where(h, t_n, big), axis=2)
        t_far = jnp.max(jnp.where(h, t_f, -big), axis=2)
        t_near = jnp.where(hit, t_near, MISS_T)
        t_far = jnp.where(hit, t_far, MISS_T)
        if spec.occ_gap_skip:
            # within-union gap skipping: stratify each performer's budget
            # over the union MEASURE of its hit slice intervals (skipping
            # the gaps between sub-boxes) instead of the hull interval.
            # The background keeps the hull path: its box is replicated
            # across K (identical slices union to the hull) and it alone
            # carries the behind-camera entry clamp below.
            t_near = t_near.at[:, 0].set(
                jnp.where(t_near[:, 0] <= 0, 0.0, t_near[:, 0]))
            keys = (jax.random.split(key, lp1) if key is not None
                    else [None] * lp1)
            ts = [stratified_between(t_near[:, 0], t_far[:, 0], S1, keys[0])]
            ts += [stratified_union(t_n[:, i], t_f[:, i], h[:, i], S1, keys[i])
                   for i in range(1, lp1)]
            return jnp.stack(ts), hit.T
    else:
        o_b = jnp.broadcast_to(inputs.rays_o[:, None, :], (N, lp1, 3))
        d_b = jnp.broadcast_to(inputs.rays_d[:, None, :], (N, lp1, 3))
        t_near, t_far, hit = ray_aabb_intersect(
            o_b, d_b, boxes_all[..., 0, :], boxes_all[..., 1, :])  # (N, L+1)
    # Background entry clamp: never start behind the camera
    # (ref: layers/RaySamplePoint.py:93-95).
    t_near = t_near.at[:, 0].set(jnp.where(t_near[:, 0] <= 0, 0.0, t_near[:, 0]))

    keys = jax.random.split(key, lp1) if key is not None else [None] * lp1
    ts = [stratified_between(t_near[:, i], t_far[:, i], S1, keys[i])
          for i in range(lp1)]
    return jnp.stack(ts), hit.T


def _coarse_march_segmented(params: dict, spec: LayeredSpec, xyz: jnp.ndarray,
                            t_c: jnp.ndarray, hit: jnp.ndarray,
                            edits: EditState, d_p: jnp.ndarray,
                            frame_ids: jnp.ndarray):
    """Front-to-back coarse march in ``spec.coarse_exit_segments`` sequential
    field dispatches with transmittance-driven early exit (inference fast
    path; see the LayeredSpec docstring). After each segment, a layer whose
    own accumulated transmittance on a ray fell below ``coarse_exit_eps``
    stops paying for that ray (through the per-kernel-tile flag machinery —
    skipped tiles write zeros, and a zero-sigma sample has zero compositing
    weight, so every downstream consumer is consistent). Exact when eps=0:
    all keeps stay true and segments concatenate to the single-dispatch
    outputs sample for sample.
    """
    lp1, _, N, S1 = xyz.shape
    n_seg = max(1, min(spec.coarse_exit_segments, S1))
    bounds = [round(k * S1 / n_seg) for k in range(n_seg + 1)]
    eps = spec.coarse_exit_eps
    log_eps = math.log(eps) if eps > 0 else -math.inf

    keep = hit
    log_t = jnp.zeros((lp1, N), t_c.dtype)
    rgb_parts, sig_parts = [], []
    for k in range(n_seg):
        lo, hi = bounds[k], bounds[k + 1]
        act = jnp.any(keep, axis=1) & (edits.visible > 0)
        rgb_k, sig_k = _eval_fields(params, spec, xyz[..., lo:hi], d_p,
                                    frame_ids, fine=False, active=act,
                                    ray_hit=keep)
        rgb_parts.append(rgb_k)
        sig_parts.append(sig_k)
        if k + 1 < n_seg:
            # accumulate each layer's own log-transmittance over the segment
            # using exactly the sigma the compositor will see (same zeroing
            # rules: misses, hidden, t<0, near clip, density threshold) —
            # alpha_i = 1-exp(-relu(sigma_i) * delta_i), so
            # log T = -sum relu(sigma_i) * delta_i. The segment's last delta
            # closes against the next segment's first t (the 1e10 boarder
            # pad only ever applies to the final sample, never mid-march).
            t_seg = t_c[..., lo:hi]
            sig_m = _mask_sigma_coarse(spec, sig_k, t_seg, hit, edits)
            delta = t_c[..., lo + 1:hi + 1] - t_seg
            log_t = log_t - jnp.sum(jax.nn.relu(sig_m) * delta, axis=-1)
            keep = keep & (log_t > log_eps)
    return (jnp.concatenate(rgb_parts, axis=-1),
            jnp.concatenate(sig_parts, axis=-1))


def _mask_sigma_coarse(spec, sigma, t, hit, edits):
    """Zero out densities exactly as the reference's coarse stage does:
    misses & hidden layers (ref: layered_rfrender.py:397-413), performer
    samples behind the origin (:414), background before ``near`` (:422), and
    the performer density threshold (:416-418)."""
    vis = (edits.visible[:, None, None] > 0) & hit[:, :, None]
    sigma = jnp.where(vis, sigma, 0.0)
    layer_ok = t[1:] >= 0
    sigma = sigma.at[1:].set(jnp.where(layer_ok, sigma[1:], 0.0))
    sigma = sigma.at[0].set(jnp.where(t[0] >= edits.near, sigma[0], 0.0))
    sigma = sigma.at[1:].set(jnp.where(sigma[1:] < edits.density_threshold, 0.0, sigma[1:]))
    return sigma


def _mask_sigma_fine(spec, sigma, hit, edits):
    """Fine-stage masking: misses & hidden layers, density thresholds, and the
    per-layer alpha fade (ref: layered_rfrender.py:538-576). Note the
    reference does *not* re-apply the t<0 / near clips per layer here; the
    near clip lands on the merged set only (:605)."""
    vis = (edits.visible[:, None, None] > 0) & hit[:, :, None]
    sigma = jnp.where(vis, sigma, 0.0)
    sigma = sigma.at[0].set(jnp.where(sigma[0] < edits.bkgd_density_threshold, 0.0, sigma[0]))
    sigma = sigma.at[1:].set(jnp.where(sigma[1:] < edits.density_threshold, 0.0, sigma[1:]))
    sigma = sigma * edits.alpha[:, None, None]
    return sigma


def _select_layers(layer_outputs, lp1: int):
    """Normalize the static per-layer output selection: ``None`` (or the
    full range) -> ``None`` (compute all), else a sorted in-range tuple."""
    if layer_outputs is None:
        return None
    sel = tuple(sorted({int(l) for l in layer_outputs if 0 <= int(l) < lp1}))
    return None if len(sel) == lp1 else sel


def render_rays(params: dict, spec: LayeredSpec, scene: SceneBoxes,
                inputs: RayInputs, edits: EditState,
                key: jax.Array | None = None,
                only_coarse: bool = False,
                layer_outputs=None) -> RenderOutputs:
    """Render a batch of rays through all layers. Fully jittable;
    ``spec``, ``only_coarse`` and ``layer_outputs`` are static.

    ``layer_outputs`` (optional iterable of layer ids) limits which layers'
    per-layer FINE composites are computed; unselected layers return zeros
    in ``fine_layers`` (same static shape). The merged pixel and the coarse
    per-layer pass are unaffected (coarse weights drive the importance
    resampling for every layer regardless). A drive with hidden performers
    never downloads their images (ref output contract:
    layered_neural_renderer.py:456-485), so their compositing work is pure
    waste — the field evaluations themselves are shared and still run."""
    N = inputs.rays_o.shape[0]
    L, lp1 = spec.layer_num, spec.layer_num + 1
    S1, S2 = spec.coarse_samples, spec.fine_samples
    bw = spec.boarder_weight

    rays_o, rays_d = inputs.rays_o, inputs.rays_d
    if spec.pose_refinement:
        rays_o, rays_d = apply_camera_transform(params["cam_pose"], rays_o,
                                                rays_d, inputs.cam_ids)

    # Per-ray layer bboxes (+ background), then the forward edit transform.
    if L:
        boxes_l = _gather_boxes(scene, inputs.frame_ids[:, 1:])
        # (N, L, 2, 3), or (N, L, K, 2, 3) with occupancy sub-box slices —
        # the background keeps one box, replicated over K (duplicate slices
        # union to the same interval in _coarse_sample)
        bshape = (N, 1) + boxes_l.shape[2:]
        boxes_all = jnp.concatenate(
            [jnp.broadcast_to(scene.bkgd_box, bshape), boxes_l], axis=1)
    else:
        boxes_all = jnp.broadcast_to(scene.bkgd_box, (N, 1, 2, 3))
    boxes_all = _edit_boxes(boxes_all, edits)

    if key is not None:
        key_c, key_f = jax.random.split(key)
    else:
        key_c = key_f = None

    # planar ray frames: (3, N) — coordinates lead, no tile padding
    o_p = rays_o.T
    d_p = rays_d.T

    # --- coarse stage ---
    t_c, hit = _coarse_sample(spec, scene, inputs, boxes_all, key_c)  # (L+1,N,S1)
    t_c = jax.lax.stop_gradient(t_c)
    xyz = o_p[None, :, :, None] + t_c[:, None, :, :] * d_p[None, :, :, None]
    xyz = _inverse_edit_points(xyz, edits)                    # (L+1, 3, N, S1)
    # the fused inference AND fused trainable paths deform inside the kernel
    in_kernel_deform = _use_fused_kernel(spec) or _use_trainable_fused(spec)
    if not in_kernel_deform:
        xyz = _deform(params, spec, xyz, inputs.frame_ids, inputs.cam_ids)
    # chunk-level skip predicate: any ray hits the (edited) bbox and the
    # layer is visible — hidden or fully-missed fields cost nothing
    active = jnp.any(hit, axis=1) & (edits.visible > 0)
    if spec.coarse_exit_segments > 1:
        rgb_c, sig_c_raw = _coarse_march_segmented(params, spec, xyz, t_c,
                                                   hit, edits, d_p,
                                                   inputs.frame_ids)
    else:
        rgb_c, sig_c_raw = _eval_fields(params, spec, xyz, d_p,
                                        inputs.frame_ids, fine=False,
                                        active=active, ray_hit=hit)
    sig_c = _mask_sigma_coarse(spec, sig_c_raw, t_c, hit, edits)

    per_layer_c = jax.vmap(lambda t, r, s: volume_render_planar(t, r, s, bw)
                           )(t_c, rgb_c, sig_c)
    coarse_layers = LayerOutputs(per_layer_c.color, per_layer_c.depth, per_layer_c.acc)
    if spec.nosort_composite:
        mixed_c = composite_merged_nosort(t_c, rgb_c, sig_c, bw,
                                          kernel=_use_compositor_kernel(spec))
    else:
        t_m, rgb_m, sig_m = merge_layers_planar(t_c, rgb_c, sig_c)
        mixed_c = volume_render_planar(t_m, rgb_m, sig_m, bw)
    coarse = LayerOutputs(mixed_c.color, mixed_c.depth, mixed_c.acc)

    if only_coarse:
        return RenderOutputs(coarse, coarse, coarse_layers, coarse_layers, hit)

    # --- fine stage ---
    # importance-sample and sort all layers in one batched call (one sort of
    # (L+1)*N rows beats L+1 separate dispatches)
    w_c = per_layer_c.weights[..., 0]  # (L+1, N, S1)
    t_flat = t_c.reshape(lp1 * N, S1)
    z_new = jax.lax.stop_gradient(
        sample_pdf(t_flat, w_c[:, :, 1:-1].reshape(lp1 * N, S1 - 2),
                   S2, key_f))

    if spec.fast_fine:
        # Opacity-driven fast fine (inference-only approximation, see the
        # LayeredSpec docstring): the fine nets evaluate ONLY the S2 new
        # importance samples — the S1 coarse positions carry the coarse
        # nets' raw outputs — and a performer whose coarse pass produced
        # ~no opacity on a ray (acc <= eps, so its contribution to the
        # pixel is <= eps) skips its fine kernel for that ray via the
        # per-tile flag machinery. The reference instead re-evaluates all
        # S1+S2 union positions through the fine nets
        # (ref: modeling/layered_rfrender.py:481-606); that exact
        # semantics stays the golden path in the else-branch below.
        t_n = z_new.reshape(lp1, N, S2)
        if spec.nosort_composite:
            # the stream compositor below needs each stream ascending;
            # depths are stop-gradient constants, so this payload-free
            # sort has no VJP cost (random-u sample_pdf is unsorted)
            t_n = jax.lax.sort(t_n, dimension=-1)
        xyz_n = o_p[None, :, :, None] + t_n[:, None, :, :] * d_p[None, :, :, None]
        xyz_n = _inverse_edit_points(xyz_n, edits)
        if not in_kernel_deform:
            xyz_n = _deform(params, spec, xyz_n, inputs.frame_ids,
                            inputs.cam_ids)
        opac = per_layer_c.acc[..., 0]                       # (L+1, N)
        keep = hit & (opac > spec.fine_skip_eps)
        keep = keep.at[0].set(hit[0])  # background: opacity ~1, never skip
        active_f = jnp.any(keep, axis=1) & (edits.visible > 0)
        rgb_n, sig_n = _eval_fields(params, spec, xyz_n, d_p,
                                    inputs.frame_ids, fine=True,
                                    active=active_f, ray_hit=keep)
        # skipped tiles/rays wrote zeros: zero sigma => zero weight, so the
        # carried-vs-new mix composites correctly without extra masking
        t_u = jnp.concatenate([t_c, t_n], -1)                # (L+1, N, S1+S2)
        rgb_u = jnp.concatenate([rgb_c, rgb_n], -1)
        sig_u = jnp.concatenate([sig_c_raw, sig_n], -1)
        sig_u = _mask_sigma_fine(spec, sig_u, hit, edits)  # pointwise per
        # (layer, ray): commutes with the per-layer depth sort below
        if spec.nosort_composite:
            # Training fast fine: composite the carried-coarse and new
            # importance streams WITHOUT a payload sort (lax.sort's VJP is
            # ~10x its forward on TPU) — both streams are ascending, so
            # the factorized-transmittance stream compositor computes the
            # exact union compositing: 2 streams per layer for the
            # per-layer outputs, 2*(L+1) streams for the merged pixel.
            sig_cu, sig_nu = sig_u[..., :S1], sig_u[..., S1:]
            sel = _select_layers(layer_outputs, lp1)
            pl = {l: composite_streams_nosort(
                [(t_c[l], rgb_c[l], sig_cu[l]),
                 (t_n[l], rgb_n[l], sig_nu[l])], bw)
                for l in (range(lp1) if sel is None else sel)}
            zc = jnp.zeros((N, 3), t_c.dtype)
            z1 = jnp.zeros((N, 1), t_c.dtype)
            fine_layers = LayerOutputs(
                jnp.stack([pl[l].color if l in pl else zc for l in range(lp1)]),
                jnp.stack([pl[l].depth if l in pl else z1 for l in range(lp1)]),
                jnp.stack([pl[l].acc if l in pl else z1 for l in range(lp1)]))
            def _near(tt, ss):                               # ref: :605
                return jnp.where(tt >= edits.near, ss, 0.0)
            mixed_f = composite_streams_nosort(
                [(t_c[l], rgb_c[l], _near(t_c[l], sig_cu[l]))
                 for l in range(lp1)]
                + [(t_n[l], rgb_n[l], _near(t_n[l], sig_nu[l]))
                   for l in range(lp1)], bw)
            fine = LayerOutputs(mixed_f.color, mixed_f.depth, mixed_f.acc)
            return RenderOutputs(fine, coarse, fine_layers, coarse_layers,
                                 hit)
        t_f, rgb_f, sig_f = sort_samples_planar(t_u, rgb_u, sig_u)
    else:
        t_f = sort_merge_t(t_flat, z_new)
        t_f = t_f.reshape(lp1, N, S1 + S2)

        xyz_f = o_p[None, :, :, None] + t_f[:, None, :, :] * d_p[None, :, :, None]
        xyz_f = _inverse_edit_points(xyz_f, edits)
        if not in_kernel_deform:
            xyz_f = _deform(params, spec, xyz_f, inputs.frame_ids,
                            inputs.cam_ids)
        rgb_f, sig_f = _eval_fields(params, spec, xyz_f, d_p, inputs.frame_ids,
                                    ray_hit=hit,
                                    fine=True, active=active)
        sig_f = _mask_sigma_fine(spec, sig_f, hit, edits)

    sel = _select_layers(layer_outputs, lp1)
    if sel is None:
        per_layer_f = jax.vmap(lambda t, r, s: volume_render_planar(t, r, s, bw)
                               )(t_f, rgb_f, sig_f)
        fine_layers = LayerOutputs(per_layer_f.color, per_layer_f.depth,
                                   per_layer_f.acc)
    elif sel:
        idx = jnp.asarray(sel, jnp.int32)
        p = jax.vmap(lambda t, r, s: volume_render_planar(t, r, s, bw)
                     )(t_f[idx], rgb_f[idx], sig_f[idx])

        def _put(x):
            return jnp.zeros((lp1,) + x.shape[1:], x.dtype).at[idx].set(x)

        fine_layers = LayerOutputs(_put(p.color), _put(p.depth), _put(p.acc))
    else:
        zc = jnp.zeros((lp1, N, 3), t_f.dtype)
        z1 = jnp.zeros((lp1, N, 1), t_f.dtype)
        fine_layers = LayerOutputs(zc, z1, z1)

    if spec.nosort_composite:
        sig_fc = jnp.where(t_f >= edits.near, sig_f, 0.0)  # ref: :605
        mixed_f = composite_merged_nosort(t_f, rgb_f, sig_fc, bw,
                                          kernel=_use_compositor_kernel(spec))
    else:
        t_mf, rgb_mf, sig_mf = merge_layers_planar(t_f, rgb_f, sig_f)
        sig_mf = jnp.where(t_mf >= edits.near, sig_mf, 0.0)  # ref: :605
        mixed_f = volume_render_planar(t_mf, rgb_mf, sig_mf, bw)
    fine = LayerOutputs(mixed_f.color, mixed_f.depth, mixed_f.acc)

    return RenderOutputs(fine, coarse, fine_layers, coarse_layers, hit)
