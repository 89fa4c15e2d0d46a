"""Host-memory allocation helpers for the preprocess hot path.

Numpy madvises MADV_HUGEPAGE on every allocation >= 4 MiB (its default
hugepage policy on Linux).  On kernels with `transparent_hugepage/defrag =
madvise`, each 2 MiB huge-page fault in such a region runs synchronous
direct compaction; measured on the build VM that is ~0.08 GiB/s first-touch
versus ~2.2 GiB/s with MADV_NOHUGEPAGE — a 25x penalty that dominated the
entire streaming preprocess (the C FASTA scan itself runs at ~680 MB/s).

`alloc_nohuge` returns a numpy array backed by an anonymous mmap explicitly
madvised NOHUGEPAGE, sidestepping numpy's policy without relying on the
import-time NUMPY_MADVISE_HUGEPAGE env var (which a library cannot set for
its host process).  Falls back to plain np.empty off-Linux.
"""
from __future__ import annotations

import ctypes
import mmap
import sys

import numpy as np

_MADV_NOHUGEPAGE = 15
_libc = None


def _get_libc():
    global _libc
    if _libc is None and sys.platform.startswith("linux"):
        try:
            _libc = ctypes.CDLL("libc.so.6", use_errno=True)
        except OSError:
            _libc = False
    return _libc or None


def alloc_nohuge(n: int, dtype) -> np.ndarray:
    """1-D uninitialised array of n elements whose backing pages are
    madvised MADV_NOHUGEPAGE (fast first-touch on defrag=madvise kernels).

    The mmap stays alive via the returned array's .base chain."""
    dtype = np.dtype(dtype)
    nbytes = max(int(n) * dtype.itemsize, 1)
    libc = _get_libc()
    if libc is None:
        return np.empty(n, dtype)
    buf = mmap.mmap(-1, nbytes, flags=mmap.MAP_PRIVATE | mmap.MAP_ANONYMOUS)
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    libc.madvise(ctypes.c_void_p(addr), ctypes.c_size_t(nbytes),
                 _MADV_NOHUGEPAGE)
    return np.frombuffer(buf, dtype, count=n)
