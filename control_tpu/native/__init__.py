"""ctypes bindings for the native I/O runtime (libvtkio.so).

Falls back silently when the shared library has not been built; the pure
Python writers in :mod:`control_tpu.utils.io` remain available.  Build with

    make -C control_tpu/native
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libvtkio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vtk_write_structured.restype = ctypes.c_int
    lib.vtk_write_structured.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double)]
    lib.ckpt_write.restype = ctypes.c_int
    lib.ckpt_write.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int64),
                               ctypes.c_int,
                               ctypes.POINTER(ctypes.c_double)]
    lib.ckpt_read_header.restype = ctypes.c_int
    lib.ckpt_read_header.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.c_int]
    lib.ckpt_read.restype = ctypes.c_int
    lib.ckpt_read.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.c_int64]
    _lib = lib
    return lib


def available():
    return _load() is not None


def write_vtk_native(filename, space, fields):
    """Binary structured-grid VTK via the native writer.  ``fields`` maps
    name -> array (ny, nx) or (ny, nx, 2).  Returns False when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    m = space.mesh
    names = []
    comps = []
    blobs = []
    for name, arr in fields.items():
        a = np.ascontiguousarray(np.asarray(arr), dtype=np.float64)
        names.append(name)
        comps.append(1 if a.ndim == 2 else a.shape[-1])
        blobs.append(a.ravel())
    data = np.concatenate(blobs) if blobs else np.zeros(0)
    comps_c = (ctypes.c_int * len(comps))(*comps)
    rc = lib.vtk_write_structured(
        filename.encode(), space.nodes_x, space.nodes_y,
        m.x0, m.x1, m.y0, m.y1, len(names), ";".join(names).encode(),
        comps_c, data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return rc == 0


def ckpt_write_native(filename, array):
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(np.asarray(array), dtype=np.float64)
    shape = (ctypes.c_int64 * a.ndim)(*a.shape)
    rc = lib.ckpt_write(filename.encode(), shape, a.ndim,
                        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return rc == 0


def ckpt_read_native(filename):
    lib = _load()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 8)()
    nd = lib.ckpt_read_header(filename.encode(), shape, 8)
    if nd < 0:
        return None
    shp = tuple(int(shape[i]) for i in range(nd))
    out = np.empty(shp, dtype=np.float64)
    rc = lib.ckpt_read(filename.encode(),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       out.size)
    return out if rc == 0 else None
