"""Training engine.

``make_train_step`` builds the jitted SPMD step: forward layered render of a
ray shard, RGB + mask-alpha losses, Adam with the reference's warmup/decay
schedule. With a multi-device mesh the batch is sharded over the ``data``
axis and parameters replicated — jit inserts the gradient ``psum`` over ICI.

``do_train`` is the host loop with the reference trainer's observability:
the same per-LOG_PERIOD "rays/s" log line (ref:
engine/layered_trainer.py:301-306), coarse-only warm stage
(ref: :191-194), periodic validation images, periodic + per-epoch
checkpointing (ref: :311-317), and PSNR-threshold early stop (ref: :325-331).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import EditState, RayInputs, SceneBoxes, render_rays
from ..models.layered import LayeredSpec
from .checkpoint import save_checkpoint
from .loss import mask_alpha_loss, rgb_loss


class TrainBatch(NamedTuple):
    inputs: RayInputs
    rgb: jnp.ndarray     # (N, 3)
    labels: jnp.ndarray  # (N,) int segmentation label


class CompactPool(NamedTuple):
    """HBM-resident training pool in the compact pixel format: 13 bytes/ray
    vs 56 for the decoded f32 TrainBatch (4.3x less HBM and host->device
    traffic). Rays are reconstructed on device per batch by
    :func:`make_decode` from the camera tables — the training-side analogue
    of on-chip render raygen (render/pose_device.py). The reference has no
    counterpart: it re-reads decoded f32 rays from DataLoader workers every
    step (ref: data/build.py:13-27)."""
    cams: jnp.ndarray         # (N,) uint16 camera index
    pix: jnp.ndarray          # (N,) uint32 flat pixel index v*W + u
    frames: jnp.ndarray       # (N,) uint16 1-based frame id
    labels: jnp.ndarray       # (N,) uint8 segmentation label
    bbox_labels: jnp.ndarray  # (N,) uint8 generating layer id
    rgb: jnp.ndarray          # (N, 3) uint8


class CamTables(NamedTuple):
    """Per-camera constants for on-device ray decoding (tiny, replicated)."""
    inv_K: jnp.ndarray     # (M, 3, 3) f32 — transformed-K inverse
    rot: jnp.ndarray       # (M, 3, 3) f32 c2w rotation
    origin: jnp.ndarray    # (M, 3) f32 camera centers (scene scale applied)
    near_far: jnp.ndarray  # (L+1, F+1, M, 2) f32 indexed [layer, frame, cam]


def make_decode(tables: CamTables, spec: LayeredSpec, width: int):
    """Batch decoder: CompactPool rows -> TrainBatch (jit-traceable).

    Reproduces the host ray generator's math exactly
    (data/cameras.pixel_rays_at): dir = c2w_rot @ normalize(K^-1 [u, v, 1]),
    origin = camera center. Table lookups are one-hot matmuls (MXU-friendly;
    lane-dim gathers are slow on TPU — see RESULTS.md)."""
    lp1 = spec.layer_num + 1
    M = tables.inv_K.shape[0]
    nf_flat = tables.near_far.reshape(-1, 2)

    def decode(rows: CompactPool) -> TrainBatch:
        cam = rows.cams.astype(jnp.int32)
        pix = rows.pix.astype(jnp.int32)
        frame = rows.frames.astype(jnp.float32)
        u = (pix % width).astype(jnp.float32)
        v = (pix // width).astype(jnp.float32)
        ones = jnp.ones_like(u)
        pix3 = jnp.stack([u, v, ones], axis=-1)                   # (B, 3)

        # HIGHEST throughout the decode: the one-hot gathers must return
        # camera tables bit-exactly and the 3x3 dir math defines ray
        # geometry — TPU's default bf16 matmul precision would quantize
        # origins/rotations by ~2^-8 rel, a real geometric error at scene
        # scale. Cost is negligible (B x M and B x 3x3 shapes).
        hi = jax.lax.Precision.HIGHEST
        oh = jax.nn.one_hot(cam, M, dtype=jnp.float32)            # (B, M)
        gather = functools.partial(jnp.matmul, precision=hi)
        inv_K = gather(oh, tables.inv_K.reshape(M, 9)).reshape(-1, 3, 3)
        rot = gather(oh, tables.rot.reshape(M, 9)).reshape(-1, 3, 3)
        o = gather(oh, tables.origin)                             # (B, 3)

        d = jnp.einsum("bij,bj->bi", inv_K, pix3, precision=hi)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.einsum("bij,bj->bi", rot, d, precision=hi)

        f_dim = tables.near_far.shape[1]
        nf_idx = (rows.bbox_labels.astype(jnp.int32) * f_dim
                  + rows.frames.astype(jnp.int32)) * M + cam
        nf = gather(jax.nn.one_hot(nf_idx, nf_flat.shape[0],
                                   dtype=jnp.float32), nf_flat)  # (B, 2)

        inputs = RayInputs(o, d, jnp.tile(frame[:, None], (1, lp1)),
                           cam.astype(jnp.float32), nf)
        return TrainBatch(inputs=inputs,
                          rgb=rows.rgb.astype(jnp.float32) / 255.0,
                          labels=rows.labels.astype(jnp.int32))

    return decode


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    rgb_loss: jnp.ndarray
    mask_loss: jnp.ndarray
    psnr_coarse: jnp.ndarray
    psnr_fine: jnp.ndarray


class _RawMetrics(NamedTuple):
    """Linear (mean/sum-composable) per-step quantities. PSNR is derived
    after any cross-device reduction so multi-chip logs are exact."""
    loss: jnp.ndarray
    mse_c: jnp.ndarray
    mse_f: jnp.ndarray
    mask: jnp.ndarray


def _losses(spec, edits, remove_outliers, params, scene, batch: TrainBatch,
            key, mask_on, only_coarse: bool,
            mask_scale: float = 1.0) -> tuple[jnp.ndarray, _RawMetrics]:
    """Shared forward+loss: MSE on coarse (+fine) mixed composites plus the
    gated mask-alpha loss (ref: engine/layered_trainer.py:216-281).

    ``mask_scale`` compensates the mask loss on sharded batches: the
    reference's term is a *sum* over rays, so a shard computing it over
    batch/D rays multiplies by D before the cross-device mean."""
    out = render_rays(params, spec, scene, batch.inputs, edits, key,
                      only_coarse=only_coarse)
    mse_c = rgb_loss(out.coarse.color, batch.rgb)
    m = (mask_alpha_loss(out.coarse_layers.acc, batch.labels) * mask_on * mask_scale
         if remove_outliers else jnp.asarray(0.0))
    loss = mse_c + m
    mse_f = mse_c  # only_coarse: fine == coarse composite, as the ref logs it
    if not only_coarse:
        mse_f = rgb_loss(out.fine.color, batch.rgb)
        m_f = (mask_alpha_loss(out.fine_layers.acc, batch.labels) * mask_on * mask_scale
               if remove_outliers else jnp.asarray(0.0))
        loss = loss + mse_f + m_f
        m = m + m_f
    return loss, _RawMetrics(loss, mse_c, mse_f, m)


def _finalize_metrics(raw: _RawMetrics, only_coarse: bool) -> StepMetrics:
    rgb = raw.mse_c + (0.0 if only_coarse else raw.mse_f)
    to_psnr = lambda m: -10.0 * jnp.log10(jnp.maximum(m, 1e-12))
    return StepMetrics(raw.loss, rgb, raw.mask,
                       to_psnr(raw.mse_c), to_psnr(raw.mse_f))


def sort_batch_by_hit(spec: LayeredSpec, scene: SceneBoxes,
                      batch: TrainBatch) -> TrainBatch:
    """Reorder a batch so rays sharing a performer-bbox hit pattern are
    contiguous. The loss is permutation-invariant; what changes is kernel
    tile homogeneity — the fused trainable field kernel skips whole tiles
    whose rays all miss a performer's bbox (kernels/fused_field.py
    ``tile_flags``), so grouping misses converts per-ray waste into skipped
    MXU work. The batch-level analogue of the renderer's tile-order raygen
    (render/pose_device.py)."""
    from ..models.layered import _gather_boxes
    from ..ops.sampling import ray_aabb_intersect

    L = spec.layer_num
    if L == 0:
        return batch
    inputs = batch.inputs
    N = inputs.rays_o.shape[0]
    boxes = _gather_boxes(scene, inputs.frame_ids[:, 1:])      # (N, L, 2, 3)
    o = jnp.broadcast_to(inputs.rays_o[:, None, :], (N, L, 3))
    d = jnp.broadcast_to(inputs.rays_d[:, None, :], (N, L, 3))
    _, _, hit = ray_aabb_intersect(o, d, boxes[..., 0, :], boxes[..., 1, :])
    key = jnp.sum(hit.astype(jnp.int32) * (2 ** jnp.arange(L, dtype=jnp.int32)),
                  axis=1)
    order = jnp.argsort(key)
    return jax.tree.map(lambda x: jnp.take(x, order, axis=0), batch)


def make_train_step(spec: LayeredSpec, optimizer: optax.GradientTransformation,
                    remove_outliers: bool = False):
    """Returns step(params, opt_state, scene, batch, key, mask_on,
    only_coarse) -> (params, opt_state, StepMetrics). ``only_coarse`` is
    static (two compiled variants); ``mask_on`` is a traced 0/1 scalar so
    epoch scheduling does not retrigger compilation.

    Sharding is expressed on the *inputs* (batch leaves sharded over the
    ``data`` axis, params replicated or layer-sharded); jit/XLA inserts the
    gradient ``psum`` over ICI."""

    import dataclasses

    # inference-only fused kernel off; when spec.trainable_kernel is on
    # (cfg.TPU.TRAINABLE_KERNEL), the hand-differentiated SpaceNet kernel
    # (kernels.spacenet_vjp) carries the training MLP work on TPU
    # fast_fine stays off in training unless explicitly opted in
    # (TPU.FAST_FINE_TRAIN); see LayeredSpec.fast_fine_train. The coarse
    # early exit is inference-only, always stripped (its skip decisions
    # depend on sigma, which would sever gradients mid-march).
    spec = dataclasses.replace(spec, use_pallas=False,
                               nosort_composite=True,
                               coarse_exit_segments=0,
                               fast_fine=bool(spec.fast_fine_train))
    edits = EditState.identity(spec.layer_num)

    @functools.partial(jax.jit, static_argnames=("only_coarse",),
                       donate_argnums=(0, 1))
    def step(params, opt_state, scene: SceneBoxes, batch: TrainBatch,
             key, mask_on, only_coarse: bool = False):
        def loss_fn(p):
            return _losses(spec, edits, remove_outliers, p, scene, batch,
                           key, mask_on, only_coarse)

        (_, raw), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, _finalize_metrics(raw, only_coarse)

    return step


def make_train_epoch(spec: LayeredSpec, optimizer: optax.GradientTransformation,
                     remove_outliers: bool = False, mesh=None, decode=None,
                     block: int = 1):
    """Whole-epoch device program: ``lax.scan`` over steps sampling batches
    from a device-resident ray pool.

    Per-step host<->device round trips through this environment's TPU tunnel
    cost ~20x the step's compute; with the pool resident in HBM the host
    only uploads it once and reads back per-step metrics per epoch.

    With a multi-device ``mesh`` the whole epoch runs under ``shard_map``
    over the ``data`` axis: the pool's leading axis is sharded across chips,
    each chip permutes its own shard and gathers batch/D rays per step
    (gathers stay chip-local — no collective traffic for data), gradients
    are ``pmean``-reduced over ICI and the replicated optimizer update runs
    identically everywhere. This is the green-field data-parallel trainer
    the reference never had (SURVEY.md §2.3).

    Returns epoch_fn(params, opt_state, scene, pool, key, mask_on,
    batch_size, steps, only_coarse) -> (params, opt_state, stacked metrics).
    ``pool`` is a TrainBatch whose leaves hold the WHOLE pool (N_pool, ...);
    with a mesh they must be sharded over the data axis (``shard_pool``)
    and N_pool, batch_size must divide by the data-axis size.

    ``block`` > 1 draws each batch as ``batch_size/block`` CONTIGUOUS index
    blocks instead of independent rays — meant for pools globally ordered
    by (frame, hit pattern) at assembly (data/raygen.order_pool_by_hit),
    where a contiguous block shares one bbox-hit pattern and kernel tiles
    come out hit-homogeneous WITHOUT the per-batch argsort (which cannot
    help when the draw itself mixed patterns). Every ray keeps a uniform
    marginal draw probability (blocks are uniform over ``N_pool//block``
    starts; at most ``block-1`` tail rays are never drawn). Requires
    ``block | batch_size`` (per shard).
    """
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    # inference-only fused kernel off; when spec.trainable_kernel is on
    # (cfg.TPU.TRAINABLE_KERNEL), the hand-differentiated SpaceNet kernel
    # (kernels.spacenet_vjp) carries the training MLP work on TPU
    # fast_fine stays off in training unless explicitly opted in
    # (TPU.FAST_FINE_TRAIN); see LayeredSpec.fast_fine_train. The coarse
    # early exit is inference-only, always stripped (its skip decisions
    # depend on sigma, which would sever gradients mid-march).
    spec = dataclasses.replace(spec, use_pallas=False,
                               nosort_composite=True,
                               coarse_exit_segments=0,
                               fast_fine=bool(spec.fast_fine_train))
    edits = EditState.identity(spec.layer_num)
    # group rays by bbox-hit pattern so the fused kernel's tile-skip flags
    # bite (only the trainable-fused path consumes them)
    from ..models.layered import _use_trainable_fused
    block = max(int(block), 1)
    # with block draws from a hit-ordered pool, batches arrive grouped — the
    # per-batch argsort would only pay its sort cost to reproduce the order
    sort_hits = (_use_trainable_fused(spec) and spec.layer_num > 0
                 and block == 1)

    n_data = 1 if mesh is None else mesh.shape[DATA_AXIS]
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) != 1 and n_data > 1:
        raise ValueError("epoch training is data-parallel; use a mesh with "
                         "model axis 1 (params are replicated)")

    def scan_epoch(params, opt_state, scene, pool, key, mask_on,
                   batch_size, steps, only_coarse, mask_scale=1.0,
                   fold_axis=False):
        n_pool = pool.rgb.shape[0]
        key, pkey = jax.random.split(key)
        if fold_axis:  # distinct shard-local permutation & sample jitter
            didx = jax.lax.axis_index(DATA_AXIS)
            pkey = jax.random.fold_in(pkey, didx)
        if block > 1:
            # locality-preserving draw: uniform block starts from the
            # (frame, hit-pattern)-ordered pool; each block is one
            # homogeneous run of `block` rays. The scan carries the STARTS
            # and the body fetches each block as one dynamic slice — at
            # capture scale the pool is a 16M-row HBM table, and a
            # batch-size scattered gather from it costs ~30% of the step;
            # bpb contiguous slices lower to a slice-sized gather XLA
            # vectorizes well.
            assert batch_size % block == 0, (batch_size, block)
            nb = n_pool // block
            bpb = batch_size // block
            bdraw = steps * bpb
            if bdraw * 4 < nb or bdraw > nb:
                starts = jax.random.randint(pkey, (steps, bpb), 0, nb)
            else:
                starts = jax.random.permutation(pkey, nb)[:bdraw]
                starts = starts.reshape(steps, bpb)
            order = starts * block          # (steps, bpb) row offsets
        else:
            draw = steps * batch_size
            if draw * 4 < n_pool or draw > n_pool:
                # Index sampling (with replacement): for big pools a full
                # permutation sorts n_pool keys PER SEGMENT (minutes per
                # epoch at a 164M-ray capture pool) for no statistical
                # benefit; and a draw larger than the pool cannot be
                # covered by a permutation at all.
                order = jax.random.randint(pkey, (steps, batch_size), 0,
                                           n_pool)
            else:
                order = jax.random.permutation(pkey, n_pool)[:draw]
                order = order.reshape(steps, batch_size)

        def body(carry, idx):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            if fold_axis:
                sub = jax.random.fold_in(sub, didx)
            if block > 1:
                def draw(x):
                    sl = jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(
                        x, s, block, axis=0))(idx)     # (bpb, block, ...)
                    return sl.reshape((-1,) + x.shape[1:])
                batch = jax.tree.map(draw, pool)
            else:
                batch = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), pool)
            if decode is not None:
                batch = decode(batch)
            if sort_hits:
                batch = sort_batch_by_hit(spec, scene, batch)

            def loss_fn(p):
                return _losses(spec, edits, remove_outliers, p, scene, batch,
                               sub, mask_on, only_coarse,
                               mask_scale=mask_scale)

            (_, raw), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if fold_axis:
                grads = jax.lax.pmean(grads, DATA_AXIS)
                raw = jax.tree.map(lambda m: jax.lax.pmean(m, DATA_AXIS), raw)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), raw

        (params, opt_state, _), raw = jax.lax.scan(
            body, (params, opt_state, key), order)
        return params, opt_state, _finalize_metrics(raw, only_coarse)

    @functools.partial(jax.jit, static_argnames=("batch_size", "steps",
                                                 "only_coarse"),
                       donate_argnums=(0, 1))
    def epoch(params, opt_state, scene: SceneBoxes, pool: TrainBatch, key,
              mask_on, batch_size: int, steps: int, only_coarse: bool = False):
        if n_data == 1:
            return scan_epoch(params, opt_state, scene, pool, key, mask_on,
                              batch_size, steps, only_coarse)

        assert batch_size % n_data == 0, (batch_size, n_data)

        def shard_body(params, opt_state, scene, pool, key, mask_on):
            # per-shard batch is batch/D; the mask loss is a sum over rays
            # in the reference, so scale by D before the pmean (the
            # outlier-count gate then applies at per-shard granularity,
            # same rays-per-threshold density as the global gate)
            return scan_epoch(params, opt_state, scene, pool, key, mask_on,
                              batch_size // n_data, steps, only_coarse,
                              mask_scale=float(n_data), fold_axis=True)

        mapped = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(), P(), P(DATA_AXIS), P(), P()),
            out_specs=(P(), P(), P()))
        return mapped(params, opt_state, scene, pool, key, mask_on)

    return epoch


def shard_pool(pool: TrainBatch, mesh) -> tuple[TrainBatch, int]:
    """Pad the pool's ray axis to a multiple of the data-axis size (edge
    replication — a handful of duplicated rays) and place every leaf with
    its leading axis sharded across the mesh. Returns (pool, padded_n)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    d = mesh.shape[DATA_AXIS]
    n = pool.rgb.shape[0]
    n_pad = ((n + d - 1) // d) * d
    if n_pad != n:
        pool = jax.tree.map(
            lambda x: jnp.concatenate(
                [jnp.asarray(x),
                 jnp.broadcast_to(jnp.asarray(x)[-1:],
                                  (n_pad - n,) + x.shape[1:])]), pool)
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), s), pool), n_pad


def make_pool(train_pool: dict, spec: LayeredSpec) -> TrainBatch:
    """Decode the pregenerated {rays, rgbs, labels, near_fars} arrays into a
    device-ready TrainBatch pool (replaces the torch DataLoader;
    ref: data/build.py:13-27)."""
    from ..models.rays import unpack_rays

    return TrainBatch(
        inputs=unpack_rays(train_pool["rays"], spec, train_pool["near_fars"]),
        rgb=jnp.asarray(np.asarray(train_pool["rgbs"]), jnp.float32),
        labels=jnp.asarray(np.asarray(train_pool["labels"]).reshape(-1), jnp.int32))


def split_compact_bundle(bundle: dict) -> tuple[CompactPool, CamTables, int]:
    """A compact pool bundle (data/raygen.build_ray_pool output when the
    transform is deterministic) -> (per-ray CompactPool, CamTables, width)."""
    pool = CompactPool(
        cams=jnp.asarray(np.asarray(bundle["cams"], np.uint16)),
        pix=jnp.asarray(np.asarray(bundle["pix"], np.uint32)),
        frames=jnp.asarray(np.asarray(bundle["frames"], np.uint16)),
        labels=jnp.asarray(np.asarray(bundle["labels"], np.uint8)),
        bbox_labels=jnp.asarray(np.asarray(bundle["bbox_labels"], np.uint8)),
        rgb=jnp.asarray(np.asarray(bundle["rgb"], np.uint8)))
    tables = CamTables(
        inv_K=jnp.asarray(bundle["table_inv_K"], jnp.float32),
        rot=jnp.asarray(bundle["table_rot"], jnp.float32),
        origin=jnp.asarray(bundle["table_origin"], jnp.float32),
        near_far=jnp.asarray(bundle["table_near_far"], jnp.float32))
    return pool, tables, int(bundle["width"])


def _call_val(val_fn, params, epoch, step=None):
    """Invoke a validation callback, passing the mid-epoch global step only
    when the callback accepts it (custom/test callbacks may not)."""
    import inspect

    try:
        takes_step = len(inspect.signature(val_fn).parameters) >= 3
    except (TypeError, ValueError):
        takes_step = False
    return val_fn(params, epoch, step) if takes_step else val_fn(params, epoch)


def do_train(cfg, spec: LayeredSpec, params, scene: SceneBoxes,
             train_pool: dict, optimizer=None, *, mesh=None,
             val_fn=None, resume_epoch: int = 0, resume_step: int = 0,
             opt_state=None, psnr_thres: float = 100.0,
             seed: int = 0, logger: logging.Logger | None = None,
             swriter=None):
    """Training host loop (ref: engine/layered_trainer.py:133-331).

    ``train_pool`` holds the pregenerated ray arrays {rays, rgbs, labels,
    near_fars}; the whole pool is uploaded once — sharded over ``mesh``'s
    data axis when given — and each epoch runs as one scanned device
    program (see :func:`make_train_epoch`).
    ``val_fn(params, epoch[, step])`` optionally renders validation images.
    ``resume_step`` re-enters epoch ``resume_epoch + 1`` with its first
    ``resume_step`` steps skipped (RNG is position-keyed, so the resumed
    run draws the exact batches the interrupted one would have); pass the
    saved ``opt_state`` alongside to make resumption exact.
    """
    logger = logger or logging.getLogger("stnerf_tpu.train")
    s = cfg.SOLVER
    batch_size = s.IMS_PER_BATCH
    # position-keyed RNG: the segment key depends only on (seed, epoch,
    # segment index), never on how many segments actually ran — a killed
    # run resumed mid-epoch replays the identical batch schedule
    base_key = jax.random.PRNGKey(seed)
    if opt_state is None:
        opt_state = optimizer.init(params)

    n_data = 1
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS
        n_data = mesh.shape[DATA_AXIS]
    if batch_size % max(n_data, 1):
        batch_size -= batch_size % n_data
        logger.warning("IMS_PER_BATCH trimmed to %d (multiple of data axis %d)",
                       batch_size, n_data)
    compact = "pix" in train_pool
    decode = None
    if compact:
        pool, tables, width = split_compact_bundle(train_pool)
        tables = jax.device_put(tables)
        decode = make_decode(tables, spec, width)
        n_pool = pool.pix.shape[0]
    else:
        n_pool = train_pool["rays"].shape[0]
        pool = make_pool(train_pool, spec)
    block = int(getattr(cfg.TPU, "POOL_BLOCK_DRAW", 0) or 0)
    if block > 1:
        if not (compact and bool(np.asarray(
                train_pool.get("hit_ordered", 0)))):
            # unordered pools: a contiguous block is image-scan-order pixels
            # (correlated gradient sample) with no tile-homogeneity payoff
            block = 1
        else:
            shard_bs = batch_size // max(n_data, 1)
            shard_pool = n_pool // max(n_data, 1)
            req = block
            while block > 1 and shard_bs % block:
                block -= 1   # largest feasible block <= requested
            if block > shard_pool:
                # a pool smaller than one block per shard has no blocks to
                # draw (nb = 0 -> degenerate randint + oversized slice)
                logger.info(
                    "POOL_BLOCK_DRAW %d exceeds the per-shard pool (%d "
                    "rays); falling back to per-ray draws", req, shard_pool)
                block = 1
            elif block != req:
                logger.info(
                    "POOL_BLOCK_DRAW %d does not divide the per-shard "
                    "batch %d; using %d", req, shard_bs, block)
            if block > 1:
                logger.info("hit-ordered pool: drawing %d-ray blocks", block)
    epoch_fn = make_train_epoch(spec, optimizer,
                                remove_outliers=cfg.MODEL.REMOVE_OUTLIERS,
                                mesh=mesh if n_data > 1 else None,
                                decode=decode, block=block)

    steps = max(n_pool // batch_size, 1)
    if n_data > 1:
        pool, _ = shard_pool(pool, mesh)
        logger.info("pool sharded over %d devices: %d rays, %d steps/epoch%s",
                    n_data, n_pool, steps,
                    " (compact pixel format)" if compact else "")
    else:
        pool = jax.device_put(pool)
        logger.info("pool resident on device: %d rays, %d steps/epoch%s",
                    n_pool, steps,
                    " (compact pixel format)" if compact else "")

    # Bound the length of a single device program: one scanned execution of
    # a full capture-scale epoch runs for minutes, and long executions can
    # outlive the runtime's patience (observed: TPU worker restarts at
    # ~5 min of one program). Segments pay one ~30 ms metrics readback each.
    # Ceil-split: full segments plus one short remainder segment (one extra
    # compile) so no steps are silently dropped from the epoch.
    seg = int(getattr(cfg.TPU, "EPOCH_SEGMENT_STEPS", 0) or 0)
    if seg <= 0 or seg > steps:
        seg = steps
    seg_sizes = [seg] * (steps // seg)
    if steps % seg:
        seg_sizes.append(steps % seg)

    # In-epoch checkpoint/validation cadence (ref saves every
    # CHECKPOINT_PERIOD steps and validates every 1000 steps,
    # engine/layered_trainer.py:308-317), quantized to segment boundaries —
    # at capture scale an epoch is ~an hour and this environment's TPU
    # workers can die mid-run; a resumed run then loses one segment, not
    # the epoch.
    ckpt_period = int(s.CHECKPOINT_PERIOD or 0)
    val_period = int(getattr(s, "VAL_PERIOD", 0) or 0)

    for epoch in range(1 + resume_epoch, s.MAX_EPOCHS):
        epoch_start = time.time()
        only_coarse = epoch < s.COARSE_STAGE
        mask_on = jnp.asarray(1.0 if epoch < 3 else 0.0)
        seg_metrics = []
        skip = resume_step if epoch == resume_epoch + 1 else 0
        done = 0          # steps executed or skipped so far this epoch
        ran = 0           # steps executed this epoch
        since_ckpt = since_val = 0
        for seg_i, seg_n in enumerate(seg_sizes):
            if done + seg_n <= skip:
                done += seg_n
                continue
            ekey = jax.random.fold_in(jax.random.fold_in(base_key, epoch),
                                      seg_i)
            params, opt_state, m = epoch_fn(params, opt_state, scene, pool,
                                            ekey, mask_on,
                                            batch_size=batch_size,
                                            steps=seg_n,
                                            only_coarse=only_coarse)
            seg_metrics.append(jax.device_get(m))
            done += seg_n
            ran += seg_n
            since_ckpt += seg_n
            since_val += seg_n
            last = done >= steps
            if (ckpt_period and since_ckpt >= ckpt_period and not last
                    and cfg.OUTPUT_DIR):
                save_checkpoint(cfg.OUTPUT_DIR, params, opt_state,
                                epoch, step=done)
                since_ckpt = 0
            if val_period and since_val >= val_period and not last \
                    and val_fn is not None:
                _call_val(val_fn, params, epoch,
                          step=(epoch - 1) * steps + done)
                since_val = 0
        if not seg_metrics:  # resume_step covered the whole epoch
            logger.info("Epoch %d already complete at resume; skipping", epoch)
            continue
        metrics = jax.tree.map(lambda *xs: np.concatenate(xs), *seg_metrics)
        elapsed = time.time() - epoch_start
        rays_per_s = ran * batch_size / max(elapsed, 1e-9)

        for i in range(0, ran, max(s.LOG_PERIOD, 1)):
            global_step = (epoch - 1) * steps + skip + i
            # same line format as the reference
            # (ref: engine/layered_trainer.py:304-306)
            logger.info(
                "Epoch[%d] Iteration[%d/%d] Loss: %.3e  Psnr coarse: %.2f "
                "Psnr fine: %.2f Speed: %.1f[rays/s]",
                epoch, skip + i, steps, float(metrics.loss[i]),
                float(metrics.psnr_coarse[i]), float(metrics.psnr_fine[i]),
                rays_per_s)
            if swriter is not None:
                swriter.add_scalar("Loss/train_loss", float(metrics.loss[i]), global_step)
                swriter.add_scalar("TrainPsnr", float(metrics.psnr_fine[i]), global_step)
                swriter.add_scalar("Loss/mask_loss", float(metrics.mask_loss[i]), global_step)
                swriter.add_scalar("Loss/rgb_loss", float(metrics.rgb_loss[i]), global_step)

        if cfg.OUTPUT_DIR:
            save_checkpoint(cfg.OUTPUT_DIR, params, opt_state, epoch)
        if val_fn is not None:
            _call_val(val_fn, params, epoch)
        logger.info("Epoch %d done. Time: %.3f[s] Speed: %.1f[rays/s]",
                    epoch, elapsed, rays_per_s)

        mean_psnr = float(np.mean(metrics.psnr_fine))
        if mean_psnr > psnr_thres:
            logger.info("Mean epoch PSNR %.3f > threshold %.3f, stopping", mean_psnr, psnr_thres)
            break
    return params, opt_state
