"""ctypes binding for the native host-IO library (csrc/image_ops.cpp).

Fused resize + crop + flip + BGR->RGB + normalize over all cameras in one
multithreaded C++ pass; LiDAR depth rasterization. Falls back to the numpy
pipeline transparently when the library hasn't been built
(``tools/build_native.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import pipelines as pp

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libhipad_io.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.preprocess_cameras.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        if hasattr(lib, "resize_crop_cameras_u8"):
            lib.resize_crop_cameras_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
        lib.depth_maps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def serving_available() -> bool:
    """True when the uint8 serving entry point exists (lib built at or
    after its introduction)."""
    lib = _load()
    return lib is not None and hasattr(lib, "resize_crop_cameras_u8")


def preprocess_cameras(
    imgs_bgr_u8: np.ndarray,
    aug: Dict,
    num_threads: int = 0,
) -> Optional[np.ndarray]:
    """[cams, H, W, 3] uint8 BGR -> normalized RGB [cams, out_h, out_w, 3].

    Returns None when the native library is unavailable (caller falls back).
    Note: ignores ``rotate`` (the +-5.4deg train-time rotation) — use the
    numpy path when rotation augmentation is active.
    """
    lib = _load()
    if lib is None or aug.get("rotate"):
        return None
    imgs = np.ascontiguousarray(imgs_bgr_u8, dtype=np.uint8)
    cams, src_h, src_w = imgs.shape[:3]
    rw, rh = aug["resize_dims"]
    x0, y0, x1, y1 = aug["crop"]
    out = np.empty((cams, y1 - y0, x1 - x0, 3), np.float32)
    mean = np.ascontiguousarray(pp.IMG_MEAN, np.float32)
    std = np.ascontiguousarray(pp.IMG_STD, np.float32)
    lib.preprocess_cameras(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cams, src_h, src_w, rw, rh, x0, y0, y1 - y0, x1 - x0,
        int(bool(aug.get("flip"))),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1, num_threads,
    )
    return out


def resize_crop_cameras_u8(
    imgs_u8: np.ndarray,
    aug: Dict,
    to_rgb: bool = False,
    num_threads: int = 0,
) -> Optional[np.ndarray]:
    """Serving preprocessing: [cams, H, W, 3] uint8 -> uint8 crop, no
    normalization (the agent fuses mean/std into the jitted forward and
    ships uint8 to the device). Same fused resize+crop+flip geometry and
    bilinear sampling as ``preprocess_cameras``; output rounded to nearest.

    Returns None when the library is unavailable or was built before this
    entry point existed (caller falls back to the PIL path).
    """
    lib = _load()
    if (lib is None or aug.get("rotate")
            or not hasattr(lib, "resize_crop_cameras_u8")):
        return None
    imgs = np.ascontiguousarray(imgs_u8, dtype=np.uint8)
    cams, src_h, src_w = imgs.shape[:3]
    rw, rh = aug["resize_dims"]
    x0, y0, x1, y1 = aug["crop"]
    out = np.empty((cams, y1 - y0, x1 - x0, 3), np.uint8)
    lib.resize_crop_cameras_u8(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cams, src_h, src_w, rw, rh, x0, y0, y1 - y0, x1 - x0,
        int(bool(aug.get("flip"))), int(bool(to_rgb)), num_threads,
    )
    return out


def depth_maps(
    points: np.ndarray, lidar2img: np.ndarray, img_hw, strides: Sequence[int],
    max_depth: float = 60.0,
) -> Optional[List[np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    l2i = np.ascontiguousarray(lidar2img, np.float32)
    cams = l2i.shape[0]
    H, W = img_hw
    outs = [np.zeros((cams, H // s, W // s), np.float32) for s in strides]
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(outs))(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for o in outs]
    )
    st = np.ascontiguousarray(strides, np.int32)
    lib.depth_maps(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        l2i.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cams, H, W,
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(strides),
        max_depth, ptrs,
    )
    return outs
