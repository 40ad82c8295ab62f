"""Image IO: PNG and Radiance HDR via the native C++ codec
(``native/image_io.cpp``), with a numpy fallback for PNG write when the
shared library is absent.

Replaces the reference's Taichi-runtime IO (``ti.tools.imread``/``imwrite``,
``src/ibl.py:14``, ``src/main.py:55``) with framework-native codecs — no
external imaging dependency (SURVEY.md §2.4 "native components").
"""
from __future__ import annotations

import ctypes
import os
import struct
import zlib

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libimage_io.so")
_lib = None


def _build():
    """Compile native/image_io.cpp into the package tree (one-time; the
    binary is not checked in). No-op if the source or g++ is unavailable."""
    src = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                       "native", "image_io.cpp")
    if not os.path.exists(src):
        return
    import subprocess
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-Wall", src, "-lz",
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
    except Exception:
        pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rtpbr_write_png.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_uint8),
                                        ctypes.c_int, ctypes.c_int]
        lib.rtpbr_png_dims.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.rtpbr_read_png.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_uint8)]
        lib.rtpbr_write_hdr.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_int, ctypes.c_int]
        lib.rtpbr_hdr_dims.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.rtpbr_read_hdr.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    else:
        _lib = False
    return _lib


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    return np.ascontiguousarray(img)


def write_png(path: str, img: np.ndarray) -> None:
    """Write an (H, W, 3) image (float [0,1] or uint8) as PNG."""
    u8 = _to_u8(img)
    h, w = u8.shape[:2]
    lib = _load()
    if lib:
        rc = lib.rtpbr_write_png(
            path.encode(), u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h)
        if rc == 0:
            return
    _write_png_numpy(path, u8)


def encode_png(img: np.ndarray, level: int = 1) -> bytes:
    """In-memory PNG encode (the live-preview endpoint's frame format).

    zlib level 1: the preview is latency-bound, not bandwidth-bound."""
    u8 = _to_u8(img)
    h, w = u8.shape[:2]
    raw = b"".join(b"\x00" + u8[y].tobytes() for y in range(h))

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, level)) + chunk(b"IEND", b""))


def _write_png_numpy(path: str, u8: np.ndarray) -> None:
    """Pure-python PNG writer (zlib stdlib) — fallback path."""
    with open(path, "wb") as f:
        f.write(encode_png(u8, level=6))


def read_png(path: str) -> np.ndarray:
    """Read a PNG into (H, W, C) uint8 (8-bit gray/RGB/RGBA)."""
    lib = _load()
    if lib:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        if lib.rtpbr_png_dims(path.encode(), ctypes.byref(w),
                              ctypes.byref(h), ctypes.byref(c)) == 0:
            out = np.empty((h.value, w.value, c.value), np.uint8)
            rc = lib.rtpbr_read_png(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if rc == 0:
                return out
    raise IOError(f"cannot read PNG {path!r} (native codec unavailable "
                  "or unsupported flavor)")


def write_hdr(path: str, img: np.ndarray) -> None:
    """Write an (H, W, 3) float32 image as Radiance RGBE (.hdr)."""
    lib = _load()
    data = np.ascontiguousarray(np.asarray(img, np.float32))
    h, w = data.shape[:2]
    if lib:
        rc = lib.rtpbr_write_hdr(
            path.encode(),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h)
        if rc == 0:
            return
    raise IOError(f"cannot write HDR {path!r} (native codec unavailable)")


def read_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr into (H, W, 3) float32 linear radiance —
    the envmap loader for IBL scenes (``src/ibl.py:14-17`` analog)."""
    lib = _load()
    if lib:
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.rtpbr_hdr_dims(path.encode(), ctypes.byref(w),
                              ctypes.byref(h)) == 0:
            out = np.empty((h.value, w.value, 3), np.float32)
            rc = lib.rtpbr_read_hdr(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc == 0:
                return out
    raise IOError(f"cannot read HDR {path!r} (native codec unavailable)")


def hdr_to_env_layout(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) row-major-from-top -> the engine's (W, H, 3) ``img[x, y]``
    layout with y up (matches the Taichi field convention the IBL math
    assumes, ``src/ibl.py:25-29``)."""
    return np.ascontiguousarray(np.transpose(img[::-1], (1, 0, 2)))
