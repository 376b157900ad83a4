"""Image/video writers (host side).

mp4 encoding prefers imageio+ffmpeg and falls back to OpenCV's VideoWriter
when no ffmpeg binary is available (this environment), replacing the
reference's imageio.mimwrite call (ref: render/layered_neural_renderer.py:636-637).
"""

from __future__ import annotations

import os

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def write_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    arr = to_uint8(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def write_video(path: str, frames, fps: int = 25) -> str:
    """Write an mp4 (or fall back to an .avi next to it). Returns the path
    actually written."""
    frames = [to_uint8(f) for f in frames]
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, quality=8)
        return path
    except Exception:
        pass
    import cv2

    h, w = frames[0].shape[:2]
    for fourcc_name, suffix in (("mp4v", ".mp4"), ("MJPG", ".avi")):
        out_path = os.path.splitext(path)[0] + suffix
        vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*fourcc_name),
                             fps, (w, h))
        if not vw.isOpened():
            continue
        for f in frames:
            if f.ndim == 2:
                f = np.stack([f] * 3, -1)
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return out_path
    raise RuntimeError("no usable video encoder (imageio/ffmpeg or cv2)")
