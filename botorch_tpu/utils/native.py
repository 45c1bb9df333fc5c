r"""ctypes bridge to the native (C++) runtime components.

Builds `csrc/box_decomposition.cpp` into a shared library on first use
(g++, cached next to the source) and exposes
`decompose_batch_native(fronts, ref, clip_max)` — the batched Lacour
box-decomposition engine used by qNEHVI construction for m >= 3
(`acquisition/multi_objective.py::make_qnehvi`). Falls back to the numpy
implementation (`utils/multi_objective.py`) when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        src = os.path.join(root, "csrc", "box_decomposition.cpp")
        lib_path = os.path.join(root, "csrc", "libboxdecomp.so")
        try:
            if (not os.path.exists(lib_path)) or (
                os.path.getmtime(lib_path) < os.path.getmtime(src)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", src, "-o", lib_path],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
            lib.decompose_batch.restype = ctypes.c_int
            lib.decompose_batch.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # fronts
                ctypes.POINTER(ctypes.c_int64),  # front_sizes
                ctypes.c_int64,  # n_samples
                ctypes.c_int64,  # max_front
                ctypes.c_int64,  # m
                ctypes.POINTER(ctypes.c_double),  # ref_point
                ctypes.c_double,  # clip_max
                ctypes.POINTER(ctypes.c_double),  # out_lower
                ctypes.POINTER(ctypes.c_double),  # out_upper
                ctypes.POINTER(ctypes.c_int64),  # out_cell_counts
                ctypes.c_int64,  # max_cells
            ]
            lib.hypervolume_batch.restype = ctypes.c_int
            lib.hypervolume_batch.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # fronts
                ctypes.POINTER(ctypes.c_int64),  # front_sizes
                ctypes.c_int64,  # n_samples
                ctypes.c_int64,  # max_front
                ctypes.c_int64,  # m
                ctypes.POINTER(ctypes.c_double),  # ref_point
                ctypes.POINTER(ctypes.c_double),  # out_hv
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def decompose_batch_native(
    fronts: list[np.ndarray],
    ref_point: np.ndarray,
    clip_max: float = 1e8,
    max_cells: Optional[int] = None,
):
    """Batched non-dominated-region decomposition (maximization).

    Args:
        fronts: list of `(k_s, m)` Pareto fronts (already filtered to
            points above the reference).
        ref_point: `(m,)`.

    Returns `(lower, upper, counts)` with shapes `(S, C, m)`, `(S, C, m)`,
    `(S,)` — padded with zero-volume cells at the reference point — or
    `None` if the native library is unavailable.
    """
    lib = _build_and_load()
    if lib is None:
        return None
    S = len(fronts)
    m = int(ref_point.shape[-1])
    max_front = max((f.shape[0] for f in fronts), default=0)
    max_front = max(max_front, 1)
    F = np.zeros((S, max_front, m), np.float64)
    sizes = np.zeros((S,), np.int64)
    for s, f in enumerate(fronts):
        k = f.shape[0]
        sizes[s] = k
        if k:
            F[s, :k] = f
    if max_cells is None:
        # Lacour bound: #LUBs <= n*(m-1)+1 per step; generous static cap
        max_cells = max(64, (max_front * (m - 1) + 1) * m * 2)
    ref = np.ascontiguousarray(ref_point, np.float64)
    out_lo = np.zeros((S, max_cells, m), np.float64)
    out_up = np.zeros((S, max_cells, m), np.float64)
    counts = np.zeros((S,), np.int64)
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_ip = ctypes.POINTER(ctypes.c_int64)
    rc = lib.decompose_batch(
        F.ctypes.data_as(c_dp),
        sizes.ctypes.data_as(c_ip),
        S, max_front, m,
        ref.ctypes.data_as(c_dp),
        float(clip_max),
        out_lo.ctypes.data_as(c_dp),
        out_up.ctypes.data_as(c_dp),
        counts.ctypes.data_as(c_ip),
        max_cells,
    )
    if rc < 0:
        # static cap overflow — retry once with a larger cap
        return decompose_batch_native(
            fronts, ref_point, clip_max, max_cells=max_cells * 4
        )
    C = max(int(counts.max(initial=1)), 1)
    return out_lo[:, :C], out_up[:, :C], counts


def hypervolume_batch_native(
    fronts: list[np.ndarray], ref_point: np.ndarray
) -> Optional[np.ndarray]:
    """Exact dominated hypervolume per front (maximization), batched in
    one native call. Same Lacour-complement scheme as
    `utils/multi_objective.py::dominated_hypervolume_np`, ~interpreter-free.
    Returns `(S,)` float64 or `None` if the native library is unavailable.
    """
    lib = _build_and_load()
    if lib is None:
        return None
    S = len(fronts)
    m = int(ref_point.shape[-1])
    max_front = max((f.shape[0] for f in fronts), default=0)
    max_front = max(max_front, 1)
    F = np.zeros((S, max_front, m), np.float64)
    sizes = np.zeros((S,), np.int64)
    for s, f in enumerate(fronts):
        k = f.shape[0]
        sizes[s] = k
        if k:
            F[s, :k] = f
    ref = np.ascontiguousarray(ref_point, np.float64)
    out = np.zeros((S,), np.float64)
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_ip = ctypes.POINTER(ctypes.c_int64)
    lib.hypervolume_batch(
        F.ctypes.data_as(c_dp),
        sizes.ctypes.data_as(c_ip),
        S, max_front, m,
        ref.ctypes.data_as(c_dp),
        out.ctypes.data_as(c_dp),
    )
    return out
