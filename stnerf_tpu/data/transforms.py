"""Joint image/label/K/T transforms (host side, PIL + NumPy).

Re-implements the reference's ``Random_Transforms`` augmentation
(ref: data/transforms/random_transforms.py:45-163): optional random rotation
about the principal point, random translation (with mask-centroid centering),
crop to the target aspect ratio and resize — applied identically to the
image, its label map and an ROI validity map, with the intrinsics updated to
match. The shipped scene configs use SHIFT/MAXRATION/ROTATION = 0, where
this reduces to a deterministic crop+resize.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def _rotation_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)


class JointTransform:
    """Callable mirroring the reference transform's signature.

    __call__(img: PIL.Image | np.ndarray HxWx3, K (3,3), T (4,4),
             label HxW or None, mask=None)
      -> (image (3, H', W') float[0,1], label (1, H', W') float,
          K', T', roi (1, H', W'))
    """

    def __init__(self, size_hw: tuple[int, int], random_range: float = 0,
                 random_ratio: float = 0, random_rotation: float = 0,
                 is_train: bool = True, rng: np.random.Generator | None = None):
        self.size = tuple(size_hw)  # (H, W)
        self.random_range = random_range
        self.random_ratio = random_ratio
        self.random_rotation = random_rotation
        self.is_train = is_train
        self.rng = rng or np.random.default_rng()

    def __call__(self, img, K, T, label=None, mask=None):
        K = np.array(K, np.float32, copy=True)
        T = np.array(T, np.float32, copy=True)
        out_h, out_w = self.size

        # Identity fast path: no augmentation and the image is already the
        # target size (all shipped configs: SHIFT/MAXRATION/ROTATION = 0).
        # Skips four PIL round trips per camera — at capture scale (1080p)
        # the dead warp dominated pregeneration wall-clock.
        if (not self.random_range and not self.random_ratio
                and not self.random_rotation and mask is None):
            arr = np.asarray(img, np.uint8) if isinstance(img, Image.Image) \
                else np.asarray(img)
            if arr.ndim == 3 and arr.shape[:2] == (out_h, out_w):
                image = np.moveaxis(arr[..., :3].astype(np.float32) / 255.0,
                                    -1, 0)
                roi = np.ones((1, out_h, out_w), np.float32)
                lab = None
                if label is not None:
                    lab = np.asarray(label, np.float32)[None]
                return image, lab, K, T, roi

        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        width, height = img.size

        offset = self.rng.integers(-self.random_range, self.random_range + 1) \
            if self.random_range else 0
        offset2 = self.rng.integers(-self.random_range, self.random_range + 1) \
            if self.random_range else 0
        rotation = ((self.rng.random() - 0.5) * np.deg2rad(self.random_rotation)
                    if self.random_rotation else 0.0)
        ratio = (self.rng.random() * self.random_ratio + 1.0
                 if self.random_ratio else 1.0)

        # rotating the image about the principal point = rotating the camera
        # about its optical axis (ref: random_transforms.py:70-73)
        if rotation:
            T[:3, :3] = T[:3, :3] @ _rotation_z(rotation)

        m_scale = height / out_h
        cx = cy = 0.0
        if mask is not None and self.is_train:
            m = np.asarray(mask)
            if m.ndim == 3:
                m = m[..., 0]
            ys, xs = np.nonzero(m)
            if len(ys):
                cy, cx = ys.mean() - height / 2, xs.mean() - width / 2
        translation = (offset * m_scale - cx, offset2 * m_scale - cy)

        crop_h = int(height / ratio)
        crop_w = int(height * out_w / ratio / out_h)

        def warp(pil_img, resample):
            out = pil_img
            if rotation:
                out = out.rotate(np.rad2deg(rotation), resample=resample,
                                 center=(float(K[0, 2]), float(K[1, 2])))
            if translation != (0.0, 0.0):
                out = out.transform(out.size, Image.AFFINE,
                                    (1, 0, -translation[0], 0, 1, -translation[1]),
                                    resample=resample)
            out = out.crop((0, 0, crop_w, crop_h))
            return out.resize((out_w, out_h), resample)

        image = np.asarray(warp(img.convert("RGB"), Image.BICUBIC),
                           np.float32) / 255.0                      # (H', W', 3)

        roi_img = Image.fromarray(np.full((height, width), 255, np.uint8))
        roi = np.asarray(warp(roi_img, Image.BICUBIC), np.float32) / 255.0

        lab = None
        if label is not None:
            lab_img = Image.fromarray(np.asarray(label, np.uint8))
            lab = np.asarray(warp(lab_img, Image.NEAREST), np.float32)

        K[0, 2] += translation[0]
        K[1, 2] += translation[1]
        K *= out_h * ratio / height
        K[2, 2] = 1.0

        image = np.moveaxis(image, -1, 0)
        roi = roi[None]
        if lab is not None:
            lab = lab[None]
        return image, lab, K, T, roi
