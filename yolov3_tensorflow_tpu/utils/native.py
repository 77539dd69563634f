"""ctypes binding for the native host postprocess library (native/).

Auto-builds native/libyolopost.so with g++ on first use (cached), with a
transparent pure-numpy fallback when no toolchain is available. The native
path accelerates evaluation-side NMS the way the reference leaned on
TensorFlow's C++ NMS op (nms_utils.py:36); `python -m
yolov3_tensorflow_tpu.utils.native` builds + self-tests it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libyolopost.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "postprocess.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None

        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.yolo_nms.restype = ctypes.c_int32
        lib.yolo_nms.argtypes = [f32p, f32p, ctypes.c_int32, ctypes.c_int32,
                                 ctypes.c_float, ctypes.c_float, i32p]
        lib.yolo_nms_multiclass.restype = ctypes.c_int32
        lib.yolo_nms_multiclass.argtypes = [
            f32p, f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, f32p, f32p, i32p]
        lib.yolo_iou_matrix.restype = None
        lib.yolo_iou_matrix.argtypes = [f32p, ctypes.c_int32, f32p,
                                        ctypes.c_int32, ctypes.c_float, f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _f32(a: np.ndarray):
    return np.ascontiguousarray(a, np.float32)


def nms(boxes: np.ndarray, scores: np.ndarray, max_out: int = 50,
        iou_thresh: float = 0.5, pixel_offset: float = 0.0) -> list:
    """Native greedy NMS; same contract as ops.nms.py_nms."""
    lib = load()
    if lib is None:
        from yolov3_tensorflow_tpu.ops.nms import py_nms
        return py_nms(boxes, scores, max_out, iou_thresh, pixel_offset)
    b = _f32(boxes)
    s = _f32(scores)
    keep = np.empty(max_out, np.int32)
    n = lib.yolo_nms(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(s), max_out, iou_thresh, pixel_offset,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return keep[:n].tolist()


def nms_multiclass(boxes: np.ndarray, scores: np.ndarray, num_classes: int,
                   max_per_class: int = 50, score_thresh: float = 0.5,
                   iou_thresh: float = 0.5
                   ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray],
                              Optional[np.ndarray]]:
    """Native per-class NMS; same contract as ops.nms.cpu_nms."""
    lib = load()
    boxes = np.reshape(boxes, (-1, 4))
    scores = np.reshape(scores, (-1, num_classes))
    if lib is None:
        from yolov3_tensorflow_tpu.ops.nms import cpu_nms
        return cpu_nms(boxes, scores, num_classes, max_per_class,
                       score_thresh, iou_thresh)
    b = _f32(boxes)
    s = _f32(scores)
    cap = num_classes * max_per_class
    out_b = np.empty((cap, 4), np.float32)
    out_s = np.empty(cap, np.float32)
    out_l = np.empty(cap, np.int32)
    total = lib.yolo_nms_multiclass(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b.shape[0], num_classes, max_per_class, score_thresh, iou_thresh,
        out_b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if total == 0:
        return None, None, None
    return out_b[:total].copy(), out_s[:total].copy(), out_l[:total].copy()


def iou_matrix(a: np.ndarray, b: np.ndarray,
               pixel_offset: float = 0.0) -> np.ndarray:
    """Native pairwise IoU [n, 4] x [m, 4] -> [n, m]."""
    lib = load()
    a = np.reshape(a, (-1, 4))
    b = np.reshape(b, (-1, 4))
    if lib is None:
        from yolov3_tensorflow_tpu.evaluation.metrics import _iou_matrix
        return _iou_matrix(a.astype(np.float32), b.astype(np.float32))
    aa, bb = _f32(a), _f32(b)
    out = np.empty((a.shape[0], b.shape[0]), np.float32)
    lib.yolo_iou_matrix(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.shape[0],
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[0],
        pixel_offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


if __name__ == "__main__":
    ok = available()
    print(f"native library: {'available at ' + _LIB_PATH if ok else 'UNAVAILABLE (numpy fallback active)'}")
    if ok:
        rng = np.random.default_rng(0)
        boxes = rng.uniform(0, 100, (50, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:]) * 0.3 + 5
        scores = rng.uniform(0, 1, 50).astype(np.float32)
        from yolov3_tensorflow_tpu.ops.nms import py_nms
        assert nms(boxes, scores, 50, 0.5) == py_nms(boxes, scores, 50, 0.5)
        print("self-test: native NMS == numpy oracle")
