"""ctypes bindings for the native host library (native/stnerf_host.cpp).

Every entry point has a pure-NumPy fallback; ``available()`` reports whether
the shared library was found (build with ``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_SEARCHED = False


def _src_hash(src: str) -> str:
    import hashlib

    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _maybe_build(native_dir: str) -> None:
    """Compile the library from source on first use (the binary is not
    checked in — it cannot be reviewed and drifts from the source). A
    ``.srchash`` sidecar records the sha256 of the source the binary was
    built from; ``_load`` refuses binaries whose sidecar does not match the
    current source. Build failures are non-fatal: every caller has a
    NumPy fallback."""
    import subprocess

    src = os.path.join(native_dir, "stnerf_host.cpp")
    out = os.path.join(native_dir, "libstnerf_host.so")
    if not os.path.exists(src) or os.environ.get("STNERF_NO_BUILD"):
        return
    h = _src_hash(src)
    if os.path.exists(out) and _stored_hash(out) == h:
        return
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-fPIC", "-shared",
                        "-std=c++17", "-o", out, src],
                       check=True, capture_output=True, timeout=300)
        with open(out + ".srchash", "w") as f:
            f.write(h)
    except Exception:
        pass


def _stored_hash(lib_path: str) -> str | None:
    try:
        with open(lib_path + ".srchash") as f:
            return f.read().strip()
    except OSError:
        return None


def _load():
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    _maybe_build(native_dir)
    src = os.path.join(native_dir, "stnerf_host.cpp")
    want = _src_hash(src) if os.path.exists(src) else None
    for cand in (os.environ.get("STNERF_HOST_LIB"),
                 os.path.join(native_dir, "libstnerf_host.so")):
        if not cand or not os.path.exists(cand):
            continue
        # the repo-local binary must have been built from the current
        # source (an explicit STNERF_HOST_LIB override is trusted as-is)
        if (cand != os.environ.get("STNERF_HOST_LIB")
                and _stored_hash(cand) != want):
            continue
        try:
            lib = ctypes.CDLL(cand)
            if lib.stnerf_abi_version() == 1:
                _configure(lib)
                _LIB = lib
                break
        except OSError:
            pass
    return _LIB


def _configure(lib):
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.stnerf_ply_read_points.restype = ctypes.c_long
    lib.stnerf_ply_read_points.argtypes = [ctypes.c_char_p, f32p, ctypes.c_long]
    lib.stnerf_pixel_rays.restype = None
    lib.stnerf_pixel_rays.argtypes = [f32p, f32p] + [ctypes.c_int] * 4 + [f32p]
    lib.stnerf_rasterize.restype = None
    lib.stnerf_rasterize.argtypes = [f32p, f32p, ctypes.c_long, i32p,
                                     ctypes.c_long, u8p, ctypes.c_int,
                                     ctypes.c_int, f32p, f32p, ctypes.c_int,
                                     ctypes.c_int, u8p, f32p]
    lib.stnerf_near_far.restype = None
    lib.stnerf_near_far.argtypes = [f32p, ctypes.c_long, f32p, ctypes.c_int,
                                    f32p, f32p]


def available() -> bool:
    return _load() is not None


def ply_read_points(path: str) -> np.ndarray | None:
    """Native PLY read; None on unsupported layout (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    # size the buffer from the header's vertex count (cheap text scan)
    try:
        with open(path, "rb") as f:
            head = f.read(8192).decode("ascii", "replace")
        for line in head.splitlines():
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
                break
        else:
            return None
    except OSError:
        return None
    out = np.empty((n, 3), np.float32)
    got = lib.stnerf_ply_read_points(path.encode(), out, out.size)
    if got != n:
        return None
    return out


def pixel_rays(K: np.ndarray, c2w: np.ndarray, h: int, w: int,
               roi=None) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    minh, maxh, minw, maxw = roi if roi is not None else (0, h, 0, w)
    out = np.empty(((maxh - minh) * (maxw - minw), 6), np.float32)
    lib.stnerf_pixel_rays(np.ascontiguousarray(K, np.float32),
                          np.ascontiguousarray(c2w, np.float32),
                          minh, maxh, minw, maxw, out)
    return out


def rasterize(verts, uvs, faces, texture, K, c2w, h: int, w: int):
    """Textured-mesh rasterization -> (rgb (H,W,3) u8, depth (H,W) f32).
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    uvs = np.ascontiguousarray(uvs, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    texture = np.ascontiguousarray(texture, np.uint8)
    w2c = np.ascontiguousarray(np.linalg.inv(np.asarray(c2w, np.float64)),
                               np.float32)
    rgb = np.empty((h, w, 3), np.uint8)
    depth = np.empty((h, w), np.float32)
    lib.stnerf_rasterize(verts, uvs, len(verts), faces, len(faces), texture,
                         texture.shape[0], texture.shape[1],
                         np.ascontiguousarray(K, np.float32), w2c, h, w,
                         rgb, depth)
    return rgb, depth


def near_far(pts: np.ndarray, w2c: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    w2c = np.ascontiguousarray(w2c, np.float32)
    m = w2c.shape[0]
    near = np.empty(m, np.float32)
    far = np.empty(m, np.float32)
    lib.stnerf_near_far(pts, len(pts), w2c, m, near, far)
    return near, far
