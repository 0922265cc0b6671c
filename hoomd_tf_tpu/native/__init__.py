"""Native (C++) components, built on demand with g++ and bound via ctypes.

The reference's native layer is CUDA/C++ coupling plumbing that a
single-engine design deletes (SURVEY.md section 2.2); what remains genuinely
native here is host-side I/O -- the trajectory data loader -- kept off the
Python hot path.
"""

import ctypes
import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def _build(name, sources):
    """Compile a shared library from sources if missing/stale; return path."""
    lib_path = os.path.join(_HERE, f"lib{name}.so")
    srcs = [os.path.join(_HERE, s) for s in sources]
    if os.path.exists(lib_path) and all(
            os.path.getmtime(lib_path) >= os.path.getmtime(s)
            for s in srcs):
        return lib_path
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", lib_path] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return lib_path


_gsd_lib = None


def gsd_lib():
    """The native GSD library (lazy-built)."""
    global _gsd_lib
    if _gsd_lib is None:
        lib = ctypes.CDLL(_build("htfgsd", ["gsd.cpp"]))
        lib.htf_gsd_open.restype = ctypes.c_void_p
        lib.htf_gsd_open.argtypes = [ctypes.c_char_p]
        lib.htf_gsd_nframes.restype = ctypes.c_uint64
        lib.htf_gsd_nframes.argtypes = [ctypes.c_void_p]
        lib.htf_gsd_schema.restype = ctypes.c_char_p
        lib.htf_gsd_schema.argtypes = [ctypes.c_void_p]
        lib.htf_gsd_chunk_info.restype = ctypes.c_int
        lib.htf_gsd_chunk_info.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.htf_gsd_read_chunk.restype = ctypes.c_int
        lib.htf_gsd_read_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p,
            ctypes.c_void_p]
        lib.htf_gsd_create.restype = ctypes.c_void_p
        lib.htf_gsd_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                       ctypes.c_char_p, ctypes.c_uint32]
        lib.htf_gsd_write_chunk.restype = ctypes.c_int
        lib.htf_gsd_write_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint8,
            ctypes.c_uint64, ctypes.c_uint32, ctypes.c_void_p]
        lib.htf_gsd_end_frame.restype = ctypes.c_int
        lib.htf_gsd_end_frame.argtypes = [ctypes.c_void_p]
        lib.htf_gsd_close.restype = ctypes.c_int
        lib.htf_gsd_close.argtypes = [ctypes.c_void_p]
        _gsd_lib = lib
    return _gsd_lib
