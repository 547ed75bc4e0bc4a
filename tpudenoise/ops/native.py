"""ctypes bindings for the native host kernels (native/
tpudenoise_native.cpp) — the C++ replacement of the reference's
Cython/CUDA host ops (lib/nms/cpu_nms.pyx, lib/utils/bbox.pyx).

Auto-builds the shared library on first use if a toolchain is present;
falls back to the numpy oracle otherwise.  `cfg.USE_NATIVE_NMS` gates the
dispatch (the TPU analogue of the reference's USE_GPU_NMS flag,
ref lib/model/nms_wrapper.py:15-23).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_NATIVE_DIR = osp.abspath(osp.join(osp.dirname(__file__), '..', '..',
                                   'native'))
_LIB_PATH = osp.join(_NATIVE_DIR, 'libtpudenoise_native.so')
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not osp.exists(_LIB_PATH):
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tpud_nms.restype = ctypes.c_int
        lib.tpud_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32)]
        lib.tpud_bbox_overlaps.restype = None
        lib.tpud_bbox_overlaps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.tpud_bbox_decode.restype = None
        lib.tpud_bbox_decode.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception as e:  # toolchain/lib unavailable: numpy fallback
        print(f'[tpudenoise.native] build/load failed ({e}); '
              f'using numpy fallback')
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def nms_host(dets: np.ndarray, thresh: float) -> list:
    """Greedy NMS on host; native if available, numpy oracle otherwise."""
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    lib = _load()
    if lib is None:
        from tpudenoise.ops.nms import nms_py
        return nms_py(dets, thresh)
    n = dets.shape[0]
    keep = np.empty(n, dtype=np.int32)
    n_keep = lib.tpud_nms(_fptr(dets), n, ctypes.c_float(thresh),
                          keep.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_int32)))
    return keep[:n_keep].tolist()


def bbox_overlaps_host(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    query = np.ascontiguousarray(query, dtype=np.float32)
    lib = _load()
    n, k = boxes.shape[0], query.shape[0]
    if lib is None:
        import jax.numpy as jnp
        from tpudenoise.ops.boxes import bbox_overlaps
        return np.asarray(bbox_overlaps(jnp.asarray(boxes),
                                        jnp.asarray(query)))
    out = np.empty((n, k), dtype=np.float32)
    lib.tpud_bbox_overlaps(_fptr(boxes), n, _fptr(query), k, _fptr(out))
    return out


def bbox_decode_host(boxes: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    deltas = np.ascontiguousarray(deltas, dtype=np.float32)
    lib = _load()
    if lib is None:
        import jax.numpy as jnp
        from tpudenoise.ops.boxes import bbox_transform_inv
        return np.asarray(bbox_transform_inv(jnp.asarray(boxes),
                                             jnp.asarray(deltas)))
    n = boxes.shape[0]
    out = np.empty((n, 4), dtype=np.float32)
    lib.tpud_bbox_decode(_fptr(boxes), _fptr(deltas), n, _fptr(out))
    return out
