"""ctypes bindings for the native keypoint parser (csrc/keypoint_parser.cpp).

The native data plane accelerates the input pipeline when fitting at
production scale (thousands of OpenPose JSONs per batch); the pure-Python
reader (data/keypoints.py) remains the fallback and the semantic reference.

The shared library auto-builds on first use if a toolchain is available
(`make -C csrc`); otherwise `is_available()` is False and callers fall back.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_CSRC = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                 "csrc")
_LIB_PATH = osp.join(_CSRC, "libkeypoints.so")
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except Exception:
            return None
    if not osp.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.parse_openpose_json.restype = ctypes.c_int
    lib.parse_openpose_json.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.parse_openpose_file.restype = ctypes.c_int
    lib.parse_openpose_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


_MAX_PEOPLE = 16
_MAX_FLOATS_PER_PERSON = (30 + 21 + 21 + 70) * 3  # generous upper bound


def read_keypoints_native(
    keypoint_fn: str,
    use_hands: bool = True,
    use_face: bool = True,
    use_face_contour: bool = False,
) -> np.ndarray:
    """Native-parsed equivalent of data.keypoints.read_keypoints -> [P, K, 3].

    Same row layout: body, [lhand, rhand], [face rows 17:68, [rows 0:17]].
    """
    lib = _load()
    assert lib is not None, "native parser unavailable (build csrc first)"

    cap = _MAX_PEOPLE * _MAX_FLOATS_PER_PERSON
    buf = np.empty(cap, np.float32)
    body_len = ctypes.c_int(0)
    face_len = ctypes.c_int(0)
    n = lib.parse_openpose_file(
        keypoint_fn.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap, ctypes.byref(body_len), ctypes.byref(face_len),
    )
    if n < 0:
        raise ValueError(f"native parse failed for {keypoint_fn}")

    nb, nf = body_len.value, face_len.value
    per = (nb + 42 + nf) * 3
    people = []
    for p in range(n):
        row = buf[p * per : (p + 1) * per].reshape(-1, 3)
        body = row[:nb]
        lh = row[nb : nb + 21]
        rh = row[nb + 21 : nb + 42]
        face = row[nb + 42 :]
        parts = [body]
        if use_hands:
            parts += [lh, rh]
        if use_face:
            parts.append(face[17 : 17 + 51])
            if use_face_contour:
                parts.append(face[:17])
        people.append(np.concatenate(parts, axis=0))
    return (np.stack(people) if people
            else np.zeros((0, 0, 3), np.float32))
