"""ctypes binding for the native STA matcher (native/sta_match.cpp).

Falls back silently when the shared library hasn't been built; build with
``make -C native`` (the package also attempts an automatic one-shot build on
first import when a toolchain is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_NATIVE_DIR, "libsta_match.so")
    if not os.path.isfile(so_path):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    d = ctypes.POINTER(ctypes.c_double)
    lib.sta_match.argtypes = [d, d, d, d, d, ctypes.c_int,
                              d, d, d, d, ctypes.c_int,
                              ctypes.c_double, ctypes.c_double, d]
    lib.sta_match.restype = None
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def sta_match_native(pred_boxes, scores, nouns, verbs, ttcs,
                     gt_boxes, gt_nouns, gt_verbs, gt_ttcs,
                     iou_threshold: float, ttc_threshold: float) -> np.ndarray | None:
    """Returns tp [N, 8] or None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None

    def arr(x, shape=None):
        a = np.ascontiguousarray(np.asarray(x, np.float64))
        if shape is not None:
            a = a.reshape(shape)
        return a

    pb = arr(pred_boxes, (-1, 4))
    n = len(pb)
    gb = arr(gt_boxes, (-1, 4))
    g = len(gb)
    tp = np.zeros((n, 8), np.float64)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    sc, pn, pv, pt = arr(scores), arr(nouns), arr(verbs), arr(ttcs)
    gn, gv, gt = arr(gt_nouns), arr(gt_verbs), arr(gt_ttcs)
    lib.sta_match(p(pb), p(sc), p(pn), p(pv), p(pt), n,
                  p(gb), p(gn), p(gv), p(gt), g,
                  iou_threshold, ttc_threshold, p(tp))
    return tp
