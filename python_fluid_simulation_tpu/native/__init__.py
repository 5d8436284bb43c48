"""Native (C++) runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA; these are the host-side runtime pieces
(surface extraction for artifact export).  Built lazily with g++ on first
use (``make -C python_fluid_simulation_tpu/native`` pre-builds).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpfsnative.so")
_SRC = os.path.join(_DIR, "src", "marching_cubes.cpp")

_lib = None


def _build() -> None:
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", _SRC, "-o", _SO,
        ],
        check=True,
        capture_output=True,
    )


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        _SRC
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.mc_run.restype = ctypes.c_int
    lib.mc_run.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mc_free.restype = None
    lib.mc_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class marching_cubes:  # namespace-style accessor used by utils.io
    @staticmethod
    def run(phi: np.ndarray, level: float = 0.0):
        lib = load()
        phi = np.ascontiguousarray(phi, dtype=np.float32)
        nx, ny, nz = phi.shape
        vptr = ctypes.POINTER(ctypes.c_float)()
        tptr = ctypes.POINTER(ctypes.c_int32)()
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        rc = lib.mc_run(
            phi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nx, ny, nz, ctypes.c_float(level),
            ctypes.byref(vptr), ctypes.byref(nv),
            ctypes.byref(tptr), ctypes.byref(nt),
        )
        if rc != 0:
            raise MemoryError("mc_run failed")
        try:
            verts = np.ctypeslib.as_array(vptr, shape=(nv.value, 3)).copy() if nv.value else np.zeros((0, 3), np.float32)
            tris = np.ctypeslib.as_array(tptr, shape=(nt.value, 3)).copy() if nt.value else np.zeros((0, 3), np.int32)
        finally:
            lib.mc_free(vptr)
            lib.mc_free(tptr)
        return verts, tris
