"""ctypes bindings for the native C++ trajectory preprocessor
(native/etloader.cpp). Falls back to the pure-Python loader when the shared
library is missing; `make -C native` builds it. Both paths produce identical
TrajectoryData (tests/test_native_loader.py)."""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from .dataset import TrajectoryData

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libetloader.so")


class _ETLoadResult(ctypes.Structure):
    _fields_ = [
        ("seq", ctypes.POINTER(ctypes.c_double)),
        ("loss_mask", ctypes.POINTER(ctypes.c_double)),
        ("nonlinear", ctypes.POINTER(ctypes.c_double)),
        ("peds_per_scene", ctypes.POINTER(ctypes.c_int32)),
        ("n_peds", ctypes.c_int32),
        ("n_scenes", ctypes.c_int32),
    ]


_lib = None
_build_attempted = False


def _ensure_built():
    """Build (or rebuild) the shared library when missing or stale.

    The .so is intentionally NOT committed — a tracked binary could silently
    drift from etloader.cpp. Instead it is compiled on first use and rebuilt
    whenever the source is newer; on any build failure we fall back to the
    (bitwise-identical) Python loader.
    """
    global _build_attempted
    native_dir = os.path.dirname(_LIB_PATH)
    src = os.path.join(native_dir, "etloader.cpp")
    if not os.path.exists(src):
        return
    stale = (not os.path.exists(_LIB_PATH)
             or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    # A failed build leaves no .so, so staleness never clears — attempt the
    # build at most once per process rather than re-paying the make timeout
    # on every _load_lib call.
    if stale and not _build_attempted:
        _build_attempted = True
        import subprocess

        try:
            subprocess.run(["make", "-C", native_dir], check=True,
                           capture_output=True, timeout=180)
        except Exception:
            pass


def _load_lib():
    global _lib
    if _lib is None:
        _ensure_built()
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.et_load_split.restype = ctypes.c_int
        lib.et_load_split.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(_ETLoadResult),
        ]
        lib.et_free_result.argtypes = [ctypes.POINTER(_ETLoadResult)]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_trajectory_data_native(
    data_dir: str,
    obs_len: int = 8,
    pred_len: int = 12,
    skip: int = 1,
    threshold: float = 0.02,
    min_ped: int = 1,
) -> Optional[TrajectoryData]:
    """Native-path equivalent of dataset.load_trajectory_data; None if the
    shared library is unavailable."""
    lib = _load_lib()
    if lib is None:
        return None

    files = sorted(os.listdir(data_dir))
    paths = [os.path.join(data_dir, f).encode() for f in files]
    arr = (ctypes.c_char_p * len(paths))(*paths)
    res = _ETLoadResult()
    rc = lib.et_load_split(arr, len(paths), obs_len, pred_len, skip,
                           threshold, min_ped, ctypes.byref(res))
    if rc != 0:
        raise RuntimeError(f"et_load_split failed with code {rc}")
    try:
        seq_len = obs_len + pred_len
        n = int(res.n_peds)
        s = int(res.n_scenes)
        seq = np.ctypeslib.as_array(res.seq, shape=(n, 2, seq_len)).copy()
        loss_mask = np.ctypeslib.as_array(res.loss_mask, shape=(n, seq_len)).copy()
        nl = np.ctypeslib.as_array(res.nonlinear, shape=(n,)).copy()
        npis = np.ctypeslib.as_array(res.peds_per_scene, shape=(s,)).copy()
    finally:
        lib.et_free_result(ctypes.byref(res))

    obs = seq[:, :, :obs_len].astype(np.float32).transpose(0, 2, 1)
    pred = seq[:, :, obs_len:].astype(np.float32).transpose(0, 2, 1)
    cum = [0] + np.cumsum(npis).tolist()
    return TrajectoryData(
        obs_traj=obs, pred_traj=pred,
        non_linear_ped=nl.astype(np.float32),
        loss_mask=loss_mask.astype(np.float32),
        num_peds_in_seq=npis.astype(np.int64),
        seq_start_end=[(int(a), int(b)) for a, b in zip(cum, cum[1:])],
    )
