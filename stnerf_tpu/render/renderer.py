"""LayeredNeuralRenderer — the user-facing free-viewpoint rendering API.

Method-compatible with the reference renderer
(ref: render/layered_neural_renderer.py:17-741): checkpoint discovery +
loading, camera-path authoring (smooth SLERP/B-spline paths, gt-pose paths,
lookat paths), per-layer frame scheduling with retiming, edits
(hide/show, shift/scale/alpha animation via ``s_*`` schedules, near clip,
zoom), batch rendering of paths with per-frame disk output, and video export.

Unlike the reference, the model is pure: edits are collected into an
``EditState`` per output frame and passed to the jitted render — nothing is
mutated on a module, so switching edits costs nothing and the compiled
program is reused across the whole path.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..data import RenderScene
from ..engine.checkpoint import latest_checkpoint, load_params_any
from ..models import (EditState, compute_scale_pivot, init_layered_params)
from ..models.layered import LayeredSpec
from ..utils import setup_logger
from .paths import lookat_path, lookat_path_centers, retime_frames, smooth_pose_path
from .video import write_image, write_video


class LayeredNeuralRenderer:

    def __init__(self, cfg, scale=None, shift=None, rotation=None,
                 s_shift=None, s_scale=None, s_alpha=None, params=None,
                 mesh=None):
        """``rotation`` is accepted for drop-in ctor parity with the
        reference renderer but is IGNORED — the reference stores it and
        never applies it either (ref: render/layered_neural_renderer.py:36);
        a per-layer rotation edit does not exist in either implementation.
        """
        self.cfg = cfg
        self.logger = setup_logger("stnerf_tpu.render")
        self.scale = scale
        self.shift = shift
        self.rotation = rotation  # accepted for API parity (unused in ref too)
        self.s_shift = s_shift
        self.s_scale = s_scale
        self.s_alpha = s_alpha
        self.alpha = s_alpha[0] if s_alpha is not None else None
        if s_shift is not None:
            self.shift = s_shift[0]
        if s_scale is not None:
            self.scale = s_scale[0]

        self.dataset_dir = cfg.OUTPUT_DIR
        self.output_dir = os.path.join(cfg.OUTPUT_DIR, "rendered")
        self.mesh = mesh

        self.dataset = RenderScene(cfg)
        self.spec = LayeredSpec.from_cfg(cfg, camera_num=self.dataset.camera_num)
        self.scene = self.dataset.scene_boxes
        self._exact_scene = self.scene  # pre-occupancy boxes (fidelity gate)
        self._ckpt_path = None
        self._params_supplied = params is not None
        self.params = params if params is not None else self._load_params()
        # The scale-edit pivot comes from the ORIGINAL frame-0 boxes so edits
        # stay reference-exact even when occupancy refinement shrinks boxes.
        self.scale_pivot = compute_scale_pivot(
            np.asarray(self.scene.bkgd_box), np.asarray(self.scene.boxes[0]))
        # occupancy tightening only means anything for a TRAINED field —
        # a fresh-init render (no checkpoint on disk) skips the refine
        if cfg.TPU.OCCUPANCY_SKIP and self._ckpt_path is not None:
            from .occupancy import refined_boxes_cached
            self.scene = refined_boxes_cached(
                self.params, self.spec, self.scene,
                cache_dir=self.dataset_dir, ckpt_path=self._ckpt_path,
                grid=cfg.TPU.OCC_GRID,
                sigma_thresh=cfg.TPU.OCC_SIGMA_THRESH,
                pad_voxels=cfg.TPU.OCC_PAD_VOXELS,
                refine_bkgd=cfg.TPU.OCC_BKGD,
                slices=cfg.TPU.OCC_SLICES,
                auto_tau_db=(float(cfg.TPU.FIDELITY_MIN_DB)
                             if cfg.TPU.OCC_AUTO_TAU else None))

        ln = cfg.DATASETS.LAYER_NUM
        self.layer_num = ln
        self.frame_num = cfg.DATASETS.FRAME_NUM
        self.camera_num = self.dataset.camera_num
        self.display_layers = {i: 1 for i in range(ln + 1)}
        self.min_frame = [1 + cfg.DATASETS.FRAME_OFFSET] * (ln + 1)
        self.max_frame = [cfg.DATASETS.FRAME_NUM + cfg.DATASETS.FRAME_OFFSET] * (ln + 1)
        self.min_camera_id = 0
        self.max_camera_id = self.camera_num - 1

        self.gt_poses = self.dataset.poses
        self.gt_Ks = self.dataset.Ks
        self.near = 0.0
        self.far = 20.0
        self.fps = 25
        self.height = cfg.INPUT.SIZE_TEST[1]
        self.width = cfg.INPUT.SIZE_TEST[0]

        self.poses: list = []
        self.Ks: list = []
        self.layer_frame_pairs: list = []
        self.images: list = []
        self.depths: list = []
        self.image_num = 0
        self.save_count = 0
        self.dir_name = ""
        self.trace_layer = -1
        self.s_shift_frame = None
        self.s_scale_frame = None
        self.s_alpha_frame = None

        # -- automated fidelity gate (TPU.FIDELITY_GATE) -------------------
        # The inference approximations (fast fine stage, early-exit coarse
        # march, occupancy-refined boxes) are the production default; a
        # trained checkpoint must prove they hold >= FIDELITY_MIN_DB against
        # the exact reference-semantics path (full union re-evaluation
        # through the fine nets, ref: modeling/layered_rfrender.py:481-606)
        # at the SAME weights before any frame ships with them. Below the
        # bar the renderer warns and falls back to the exact path for the
        # whole session.
        self.fidelity_db = None
        # Occupancy boxes enter the probe only in MANUAL-tau mode; auto-tau
        # culling carries its own analytic worst-case bound (see
        # _apply_fidelity_gate) and refined-but-auto boxes alone need no
        # probe (it would compare two byte-identical renders for minutes).
        occ_in_probe = (self.scene is not self._exact_scene
                        and not cfg.TPU.OCC_AUTO_TAU)
        approx = (self.spec.fast_fine or self.spec.coarse_exit_segments > 1
                  or occ_in_probe)
        # trained weights reach the renderer either from a checkpoint on
        # disk or passed in directly — both must be gated (in-memory params
        # are presumably trained; a fresh-init fallback never gets here
        # because _load_params only sets _ckpt_path on a real load)
        if (approx and cfg.TPU.FIDELITY_GATE
                and (self._ckpt_path is not None or self._params_supplied)
                and len(self.gt_poses) > 0):
            self._apply_fidelity_gate()

    # ------------------------------------------------------------------
    def _load_params(self):
        path = latest_checkpoint(self.dataset_dir)
        if path is None:
            self.logger.warning("no checkpoint under %s — using fresh params",
                                self.dataset_dir)
            return init_layered_params(jax.random.PRNGKey(0), self.spec)
        self.logger.info("loading checkpoint %s", path)
        self._ckpt_path = path
        return load_params_any(path, self.spec)

    # ------------------------------------------------------------------
    def _apply_fidelity_gate(self):
        """Probe-render the first gt pose through the approximate and the
        exact paths at the loaded weights; fall back to exact below
        ``TPU.FIDELITY_MIN_DB``. Sets ``self.fidelity_db``."""
        import dataclasses

        import jax.numpy as jnp

        from .pose_device import render_pose_on_device

        cfg = self.cfg
        pw = max(16, int(cfg.TPU.FIDELITY_PROBE_RES))
        ph = max(16, round(pw * self.height / self.width))
        K = np.array(self.gt_Ks[0], np.float32).copy()
        K[0] *= pw / self.width
        K[1] *= ph / self.height
        c2w = np.array(self.gt_poses[0], np.float32)
        if c2w.shape == (3, 4):
            c2w = np.concatenate([c2w, [[0, 0, 0, 1]]], 0).astype(np.float32)
        fids = jnp.full((self.layer_num + 1,), float(self.min_frame[0]),
                        jnp.float32)
        edits = EditState.identity(self.layer_num,
                                   scale_pivot=self.scale_pivot)
        exact_spec = dataclasses.replace(self.spec, fast_fine=False,
                                         coarse_exit_segments=0)
        chunk = min(int(cfg.TPU.RENDER_CHUNK), pw * ph)
        kw = dict(h=ph, w=pw, chunk=chunk,
                  tile_cols=min(int(cfg.TPU.TILE_COLS), pw),
                  key=jax.random.PRNGKey(0))

        def probe(spec, scene):
            out = render_pose_on_device(
                self.params, spec, scene, jnp.asarray(K), jnp.asarray(c2w),
                fids, jnp.asarray(self.dataset.near_far, jnp.float32),
                edits, **kw)
            return out.color.astype(jnp.float32) / 255.0

        # Occupancy culling under OCC_AUTO_TAU carries its own worst-case
        # per-ray alpha bound (>= FIDELITY_MIN_DB by construction,
        # render/occupancy.auto_tau) — an analytic guarantee, stronger than
        # a probe. Probing the tightened boxes vs exact would spuriously
        # reject quality-neutral culling: the smaller interval re-stratifies
        # the fixed sample budget, so every sample lands elsewhere and the
        # vs-exact PSNR caps at ~38 dB from pure quadrature shift while the
        # ground-truth cost is ~0.01 dB (RESULTS.md round 5). The probe
        # therefore measures only the approximations WITHOUT analytic
        # bounds (fast fine stage, early exit) on the pre-occupancy boxes;
        # manual-tau occupancy (no guarantee) stays inside the probe.
        probe_scene = (self._exact_scene
                       if cfg.TPU.OCCUPANCY_SKIP and cfg.TPU.OCC_AUTO_TAU
                       else self.scene)

        def fidelity(scene):
            mse = jnp.mean(jnp.square(probe(self.spec, scene)
                                      - probe(exact_spec, self._exact_scene)))
            return float(jax.device_get(
                -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))))

        self.fidelity_db = fidelity(probe_scene)
        min_db = float(cfg.TPU.FIDELITY_MIN_DB)
        if self.fidelity_db < min_db:
            if probe_scene is not self._exact_scene:
                # staged fallback: manual-tau occupancy was inside the
                # probe, and tightened boxes alone cap vs-exact PSNR at
                # ~38 dB from pure quadrature shift (re-stratified sample
                # budget) even when nothing real was culled. Before
                # reverting the whole fast stack, re-probe the fast flags
                # on the ORIGINAL boxes — if they pass alone, drop only
                # the occupancy culling.
                no_occ_db = fidelity(self._exact_scene)
                if no_occ_db >= min_db:
                    self.logger.warning(
                        "fidelity gate: manual-tau occupancy takes the "
                        "probe to %.1f dB (< %.1f) but the fast path alone "
                        "holds %.1f dB — dropping occupancy boxes, keeping "
                        "the fast path (OCC_AUTO_TAU culling would ship "
                        "under its own analytic bound instead)",
                        self.fidelity_db, min_db, no_occ_db)
                    self.fidelity_db = no_occ_db
                    self.scene = self._exact_scene
                    return
            self.logger.warning(
                "fidelity gate: approximate path %.1f dB vs exact at the "
                "loaded weights (< %.1f dB) — falling back to the exact "
                "reference-semantics path for this session",
                self.fidelity_db, min_db)
            self.spec = exact_spec
            self.scene = self._exact_scene
        else:
            self.logger.info(
                "fidelity gate: approximate path %.1f dB vs exact "
                "(>= %.1f dB) — production fast path active",
                self.fidelity_db, min_db)

    # -- layer display --------------------------------------------------
    def hide_layer(self, layer_id: int):
        self.display_layers[layer_id] = 0

    def show_layer(self, layer_id: int):
        self.display_layers[layer_id] = 1

    def is_shown_layer(self, layer_id: int) -> bool:
        return self.display_layers[layer_id] == 1

    # -- small setters (ref: layered_neural_renderer.py:643-741) --------
    def set_save_dir(self, dir_name: str):
        self.dir_name = dir_name

    def set_fps(self, fps: int):
        self.fps = fps

    def set_near(self, near: float):
        self.near = float(near)

    def set_frame_duration(self, min_frame: int, max_frame: int, layer_id: int = -1):
        ids = range(self.layer_num + 1) if layer_id == -1 else [layer_id]
        for i in ids:
            self.min_frame[i] = min_frame
            self.max_frame[i] = max_frame

    def set_pose_duration(self, min_camera_id: int, max_camera_id: int):
        self.min_camera_id = min_camera_id
        self.max_camera_id = max_camera_id

    def set_trace_layer(self, layer_id: int):
        self.trace_layer = layer_id

    def invert_poses(self):
        self.poses = list(self.poses)[::-1]
        self.Ks = list(self.Ks)[::-1]

    def get_center_frame_layer(self, frame_id: int, layer_id: int):
        return self.dataset.layer_center(layer_id, frame_id)

    def zoom_in(self, layer_id: int, frame_id: int, scale: float):
        """Pull every gt camera toward a layer's center
        (ref: layered_neural_renderer.py:731-738)."""
        center = self.dataset.layer_center(layer_id, frame_id)
        self.gt_poses = self.gt_poses.copy()
        self.gt_poses[:, :3, 3] = center + (self.gt_poses[:, :3, 3] - center) / scale

    def save_poses(self, path: str):
        np.save(path, np.asarray(self.poses))

    # -- frame scheduling ------------------------------------------------
    def _append_layer_frame_pairs(self, count: int, smooth_time: bool = False):
        for idx in range(count + 1):
            pair = []
            for layer_id in range(self.layer_num + 1):
                if self.is_shown_layer(layer_id):
                    span = self.max_frame[layer_id] - self.min_frame[layer_id]
                    fid = span / count * idx + self.min_frame[layer_id]
                    pair.append((layer_id, fid if smooth_time else int(fid)))
            self.layer_frame_pairs.append(pair)

    def _animate_edit_schedules(self, step_num: int):
        def table(spec):
            a, b = np.asarray(spec[0], float), np.asarray(spec[1], float)
            return [(a + (b - a) * i / max(step_num - 1, 1)).tolist()
                    for i in range(step_num)]

        if self.s_shift is not None:
            self.s_shift_frame = table(self.s_shift)
        if self.s_scale is not None:
            self.s_scale_frame = table(self.s_scale)
        if self.s_alpha is not None:
            self.s_alpha_frame = [float(x) for x in
                                  np.linspace(self.s_alpha[0], self.s_alpha[1], step_num)]

    # -- path authoring (ref: layered_neural_renderer.py:144-361) --------
    def set_smooth_path_poses(self, step_num: int, around: bool = False,
                              smooth_time: bool = False):
        lo, hi = self.min_camera_id, self.max_camera_id + 1
        poses, Ks = smooth_pose_path(self.gt_poses[lo:hi], self.gt_Ks[lo:hi],
                                     step_num, around=around)
        self._animate_edit_schedules(step_num)
        self.poses = list(self.poses) + list(poses)
        self.Ks = list(self.Ks) + list(Ks)
        self._append_layer_frame_pairs(step_num, smooth_time)

    def set_path_gt_poses(self):
        poses = list(self.gt_poses)
        self.poses += poses
        self.Ks += list(self.gt_Ks)
        self._append_layer_frame_pairs(len(poses))

    def set_path_fixed_gt_poses(self, id: int, num: int):
        self._animate_edit_schedules(num)
        self.poses += [self.gt_poses[id]] * num
        self.Ks += [self.gt_Ks[id]] * num
        self._append_layer_frame_pairs(num)

    def set_path_lookat(self, start, end, step_num, center, up):
        if self.trace_layer == -1:
            poses = lookat_path(start, end, step_num, center, up)
        else:
            centers = []
            for idx in range(step_num):
                lo, hi = self.min_frame[self.trace_layer], self.max_frame[self.trace_layer]
                fid = int((hi - lo) / step_num * (idx + 1)) + lo
                centers.append(self.dataset.layer_center(self.trace_layer,
                                                         fid - 1 - self.cfg.DATASETS.FRAME_OFFSET))
            poses = lookat_path_centers(start, end, centers, up)
        self.poses += list(poses)
        self.Ks += [self.gt_Ks[self.min_camera_id]] * len(poses)
        self._append_layer_frame_pairs(len(poses))

    def load_path_poses(self, poses):
        self.poses = list(poses)
        n = len(poses)
        K0, K1 = self.gt_Ks[self.min_camera_id], self.gt_Ks[self.max_camera_id - 1]
        self.Ks = [(K1 - K0) * i / max(n - 1, 1) + K0 for i in range(n)]
        self._append_layer_frame_pairs(n)

    def load_cams_from_path(self, path: str):
        campose = np.load(os.path.join(path, "RT_c2w.npy"))
        Ts = np.zeros((campose.shape[0], 4, 4), np.float32)
        Ts[:, :3, :] = campose.reshape(-1, 3, 4)
        Ts[:, 3, 3] = 1.0
        Ts[:, :3, 3] *= self.cfg.DATASETS.SCALE
        self.poses = list(Ts)
        self.Ks = list(np.load(os.path.join(path, "K.npy")).reshape(-1, 3, 3)
                       .astype(np.float32))
        self._append_layer_frame_pairs(len(self.poses))

    def retime_by_key_frames(self, layer_id, key_frames_layer, key_frames):
        """Remap one layer's timeline (ref: layered_neural_renderer.py:495-544)."""
        for i, pairs in enumerate(self.layer_frame_pairs):
            new_pairs = []
            for layer, frame in pairs:
                if layer == layer_id:
                    frame = retime_frames([frame], key_frames_layer, key_frames,
                                          self.min_frame[layer],
                                          self.max_frame[layer])[0]
                new_pairs.append((layer, frame))
            self.layer_frame_pairs[i] = new_pairs

    # -- edit state ------------------------------------------------------
    def _edits(self, frame_idx: int | None, density_threshold: float,
               bkgd_density_threshold: float) -> EditState:
        import jax.numpy as jnp

        lp1 = self.layer_num + 1
        e = EditState.identity(self.layer_num, scale_pivot=self.scale_pivot)
        vis = np.array([float(self.display_layers[i]) for i in range(lp1)],
                       np.float32)

        shift = self.shift
        scale = self.scale
        alpha = self.alpha
        if frame_idx is not None:
            if self.s_shift_frame is not None:
                shift = self.s_shift_frame[frame_idx]
            if self.s_scale_frame is not None:
                scale = self.s_scale_frame[frame_idx]
            if self.s_alpha_frame is not None:
                alpha = self.s_alpha_frame[frame_idx]

        shift_arr = np.zeros((lp1, 3), np.float32)
        if shift is not None:
            for i, s in enumerate(shift):
                if s is not None:
                    shift_arr[i] = s
        scale_arr = np.ones(lp1, np.float32)
        if scale is not None:
            scale_arr[:len(list(scale))] = scale
        alpha_arr = np.ones(lp1, np.float32)
        if alpha is not None:
            if np.ndim(alpha) == 0:
                # the reference fades layer 2 only
                # (ref: modeling/layered_rfrender.py:575-576)
                if lp1 > 2:
                    alpha_arr[2] = alpha
            else:
                alpha_arr[:len(list(alpha))] = alpha

        return e._replace(visible=jnp.asarray(vis), shift=jnp.asarray(shift_arr),
                          scale=jnp.asarray(scale_arr), alpha=jnp.asarray(alpha_arr),
                          near=jnp.asarray(np.float32(self.near)),
                          density_threshold=jnp.asarray(np.float32(density_threshold)),
                          bkgd_density_threshold=jnp.asarray(np.float32(bkgd_density_threshold)))

    # -- rendering -------------------------------------------------------
    def render_pose(self, pose, K, layer_frame_pair, density_threshold=0,
                    bkgd_density_threshold=0, frame_idx=None, timings=None,
                    download_layers=None):
        """Render one pose -> (color (H,W,3), depth (H,W,1),
        color_layer [L+1 x (H,W,3)], depth_layer [L+1 x (H,W,1)])
        (ref: layered_neural_renderer.py:364-392).

        Runs as a single on-device program (rays generated on chip,
        quantized image download) — see render.pose_device.
        """
        from .pose_device import render_pose_host

        frame_ids = np.ones(self.layer_num + 1, np.float32)
        for layer_id, frame_id in layer_frame_pair:
            frame_ids[layer_id] = frame_id
        edits = self._edits(frame_idx, density_threshold, bkgd_density_threshold)
        return render_pose_host(
            self.params, self.spec, self.scene, K, pose, frame_ids,
            self.dataset.near_far, edits, self.height, self.width,
            chunk=self.cfg.TPU.RENDER_CHUNK,
            tile_cols=self.cfg.TPU.TILE_COLS, far_clip=self.far,
            mesh=self.mesh, timings=timings,
            download_layers=download_layers)

    def _video_dir(self, sub: str) -> str:
        parts = [self.output_dir]
        if self.dir_name:
            parts.append(self.dir_name)
        parts += [f"video_{self.save_count}", sub]
        path = os.path.join(*parts)
        os.makedirs(os.path.join(path, "color"), exist_ok=True)
        os.makedirs(os.path.join(path, "depth"), exist_ok=True)
        return path

    def render_path(self, inverse_y_axis=False, density_threshold=0,
                    bkgd_density_threshold=0, auto_save=True):
        """Render every queued pose; save per-frame mixed + per-layer
        color/depth images and the pose/K tables
        (ref: layered_neural_renderer.py:401-488)."""
        save_dir = self._video_dir("mixed")
        with open(os.path.join(save_dir, "poses"), "w") as f:
            for pose in self.poses:
                f.write(str(pose) + "\n")
        with open(os.path.join(save_dir, "Ks"), "w") as f:
            for K in self.Ks:
                f.write(str(K) + "\n")

        self.images, self.depths = [], []
        self.images_layer = [[] for _ in range(self.layer_num + 1)]
        self.depths_layer = [[] for _ in range(self.layer_num + 1)]
        self.image_num = 0

        path_t0 = time.time()
        device_s = download_s = 0.0
        # hidden layers are never saved below — skip their image download
        shown = [l for l in range(self.layer_num + 1)
                 if self.is_shown_layer(l)]
        for idx, pose in enumerate(self.poses):
            self.logger.info("Rendering image %d", idx)
            timings = {}
            color, depth, color_layer, depth_layer = self.render_pose(
                pose, self.Ks[idx], self.layer_frame_pairs[idx],
                density_threshold, bkgd_density_threshold, frame_idx=idx,
                timings=timings, download_layers=shown)
            device_s += timings.get("device_s", 0.0)
            download_s += timings.get("download_s", 0.0)

            if inverse_y_axis:
                color, depth = color[::-1], depth[::-1]
                color_layer = [c[::-1] for c in color_layer]
                depth_layer = [d[::-1] for d in depth_layer]

            if auto_save:
                write_image(os.path.join(save_dir, "color", f"{self.image_num}.jpg"), color)
                write_image(os.path.join(save_dir, "depth", f"{self.image_num}.png"), depth)
                self.images.append(color)
                self.depths.append(depth)
                for layer_id in range(self.layer_num + 1):
                    if not self.is_shown_layer(layer_id):
                        continue
                    ldir = self._video_dir(str(layer_id))
                    write_image(os.path.join(ldir, "color", f"{self.image_num}.jpg"),
                                color_layer[layer_id])
                    write_image(os.path.join(ldir, "depth", f"{self.image_num}.png"),
                                depth_layer[layer_id])
                    self.images_layer[layer_id].append(color_layer[layer_id])
                    self.depths_layer[layer_id].append(depth_layer[layer_id])
            self.image_num += 1
        if self.image_num:
            elapsed = time.time() - path_t0
            # end-to-end: device render + image download (dominant through
            # a tunneled TPU; milliseconds on local hardware) + encode/save
            # device vs download vs end-to-end: the download term is this
            # environment's ~3-7 MB/s TPU tunnel (milliseconds on local
            # hardware); device_s is fenced with a scalar sync per pose
            self.logger.info(
                "Rendered %d poses at %dx%d in %.1f s (%.2f s/pose "
                "end-to-end; %.2f s/pose device render, %.2f s/pose image "
                "download)", self.image_num, self.width, self.height,
                elapsed, elapsed / self.image_num,
                device_s / self.image_num, download_s / self.image_num)

    def render_path_walking(self, inverse_y_axis=False, density_threshold=0,
                            bkgd_density_threshold=0, auto_save=True):
        """Variant with the cross-layer occlusion composite of background and
        layer 2 (ref: layered_neural_renderer.py:550-617)."""
        self.render_path(inverse_y_axis, density_threshold,
                         bkgd_density_threshold, auto_save)
        if not auto_save or self.layer_num < 2:
            return
        out_dir = os.path.join(self.output_dir, "02", "color")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(len(self.images_layer[0])):
            bg = self.images_layer[0][i].copy()
            front = self.images_layer[2][i]
            occl = (self.depths_layer[2][i] < self.depths_layer[0][i]) & (front != 0).any(-1, keepdims=True)
            bg = np.where(occl, front, bg)
            write_image(os.path.join(out_dir, f"{i}.jpg"), bg)

    def save_video(self):
        if not self.images:
            self.logger.warning("no rendered images; nothing to save")
            return
        parts = [self.output_dir] + ([self.dir_name] if self.dir_name else []) + ["video"]
        video_dir = os.path.join(*parts)
        os.makedirs(video_dir, exist_ok=True)
        write_video(os.path.join(video_dir, f"color_{self.save_count}.mp4"),
                    self.images, fps=self.fps)
        write_video(os.path.join(video_dir, f"depth_{self.save_count}.mp4"),
                    [np.repeat(d, 3, axis=-1) for d in self.depths], fps=self.fps)
        self.save_count += 1

    def check_label(self):
        """Dump label-masked inputs for inspection
        (ref: layered_neural_renderer.py:124-138)."""
        out = os.path.join(self.output_dir, "masked_images")
        for frame in range(self.frame_num):
            fdir = os.path.join(out, f"frame{frame}")
            os.makedirs(fdir, exist_ok=True)
            for cam in range(self.camera_num):
                image, label = self.dataset.get_image_label(cam, frame)
                img = np.moveaxis(image, 0, -1).copy()
                img[label[0] == 0] = 0
                write_image(os.path.join(fdir, f"{cam}.jpg"), img)
