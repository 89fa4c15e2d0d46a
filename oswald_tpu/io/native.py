"""ctypes bindings for the native IO library (native/oswald_io.cpp).

The native library accelerates the host-side data path (FASTA scan/encode
and group packing — the role of the reference's C data layer,
/root/reference/host/src/sequences.c).  It is optional: `available()`
reports whether the shared library is present (build with
`make -C native`), and oswald_tpu.io falls back to the vectorised numpy
implementations when it is not.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LIB_PATHS = [
    os.path.join(_NATIVE_DIR, "liboswald_io.so"),
    os.path.join(os.path.dirname(__file__), "liboswald_io.so"),
]

# must match oswald_io_version() in native/oswald_io.cpp; a stale build from
# an older checkout is rejected (falls back to numpy) instead of silently
# diverging
_EXPECTED_VERSION = 5

_lib = None
_build_attempted = False


def _try_build():
    """Best-effort first-use build (`make -C native`); quiet on failure —
    the numpy fallback is always available."""
    global _build_attempted
    if _build_attempted or not os.path.isfile(
            os.path.join(_NATIVE_DIR, "Makefile")):
        return
    _build_attempted = True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=False,
                       capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = _scan_paths()
    if lib is None:
        # missing OR stale/ABI-mismatched on disk: (re)build and retry
        # once — `make` overwrites a stale .so in place
        _try_build()
        lib = _scan_paths()
    _lib = lib
    return _lib


def _scan_paths():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            try:
                lib.oswald_io_version.restype = ctypes.c_int
                if lib.oswald_io_version() != _EXPECTED_VERSION:
                    continue                     # stale/ABI-mismatched build
            except AttributeError:
                continue
            c_i8p = ctypes.POINTER(ctypes.c_int8)
            c_u8p = ctypes.POINTER(ctypes.c_uint8)
            c_i64p = ctypes.POINTER(ctypes.c_int64)
            lib.oswald_fasta_count.restype = ctypes.c_int64
            lib.oswald_fasta_count.argtypes = [c_u8p, ctypes.c_int64, c_i64p]
            lib.oswald_fasta_encode.restype = ctypes.c_int64
            lib.oswald_fasta_encode.argtypes = [
                c_u8p, ctypes.c_int64, c_i8p, c_i64p, c_i64p, c_i64p]
            lib.oswald_pack_groups.restype = None
            lib.oswald_pack_groups.argtypes = [
                c_i8p, c_i64p, c_i64p, ctypes.c_int64, c_i64p, c_i8p, c_i64p]
            lib.oswald_fasta_count_mt.restype = ctypes.c_int64
            lib.oswald_fasta_count_mt.argtypes = \
                lib.oswald_fasta_count.argtypes
            lib.oswald_fasta_encode_mt.restype = ctypes.c_int64
            lib.oswald_fasta_encode_mt.argtypes = \
                lib.oswald_fasta_encode.argtypes
            lib.oswald_pack_groups_sl.restype = None
            lib.oswald_pack_groups_sl.argtypes = [
                c_i8p, c_i64p, c_i64p, c_i64p, ctypes.c_int64, c_i64p,
                c_i8p, c_i64p]
            lib.oswald_fasta_encode_titles_mt.restype = ctypes.c_int64
            lib.oswald_fasta_encode_titles_mt.argtypes = [
                c_u8p, ctypes.c_int64, c_i8p, c_i64p, c_i64p, c_i64p,
                c_u8p, c_i64p]
            lib.oswald_gather_spans.restype = None
            lib.oswald_gather_spans.argtypes = [
                c_u8p, c_i64p, c_i64p, c_i64p, ctypes.c_int64, c_u8p]
            lib.oswald_fasta_num_chunks.restype = ctypes.c_int
            lib.oswald_fasta_num_chunks.argtypes = [ctypes.c_int64]
            lib.oswald_fasta_plan.restype = ctypes.c_int64
            lib.oswald_fasta_plan.argtypes = [
                c_u8p, ctypes.c_int64, ctypes.c_int, c_i64p, c_i64p,
                c_i64p, c_i64p, c_i64p, c_i64p]
            lib.oswald_fasta_execute.restype = ctypes.c_int64
            lib.oswald_fasta_execute.argtypes = [
                c_u8p, ctypes.c_int64, ctypes.c_int, c_i64p, c_i64p,
                c_i64p, c_i64p, c_i8p, c_i64p, c_i64p, c_i64p, c_u8p]
            lib.oswald_io_version.restype = ctypes.c_int
            return lib
    return None


def available() -> bool:
    return _load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def _ws_array(ws, key, size, dtype, zero=False):
    """Persistent workspace array: grown (never shrunk) across calls.
    Fresh numpy allocations of block-scale buffers cost more in first-touch
    page faults than the C scan itself (numpy madvises MADV_HUGEPAGE and
    defrag=madvise kernels compact synchronously — see utils/hostmem.py),
    so the streaming preprocess passes one `workspace` dict through every
    block and buffers are allocated NOHUGEPAGE."""
    from oswald_tpu.utils.hostmem import alloc_nohuge
    a = ws.get(key) if ws is not None else None
    if a is None or a.size < size:
        a = alloc_nohuge(size, dtype)
        if ws is not None:
            ws[key] = a
    if zero:
        a[:size] = 0
    return a


def parse_fasta_bytes(data: bytes, titles: str | None = "list",
                      workspace: dict | None = None,
                      seq_alloc=None, titles_alloc=None):
    """Native single-pass FASTA parse; same contract as
    oswald_tpu.io.fasta.parse_fasta_bytes (including its ValueErrors for
    non-FASTA input — the C scanner itself skips malformed content, so the
    validation lives here).  titles: "list" (list[str]), "bytes"
    ((joined_bytes, lens) with one b"\\n" after each title, no Python
    per-record loop), or None (skip title work).

    workspace: optional dict reused across calls; returned arrays are then
    VIEWS into workspace buffers, invalidated by the next call — copy what
    must survive.

    seq_alloc / titles_alloc: optional `(nbytes) -> uint8/int8 view | None`
    callbacks; when one returns a view the C walk writes that output
    DIRECTLY into it (a staging arena — see io/stream._Staging) and the
    returned array is a slice of it; on None the workspace buffer is
    used."""
    lib = _load()
    assert lib is not None, "native IO library not built (make -C native)"
    if isinstance(data, np.ndarray):
        buf = data.view(np.uint8).reshape(-1)
    else:
        buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size:
        # match the numpy reference exactly: the first line must be a
        # header, and at least one header must exist
        if buf[0] != 0x3E:                            # b">"
            # error path only — fine to materialise bytes here
            blob = buf.tobytes()
            if b"\n>" not in blob:
                raise ValueError(
                    "not a FASTA file: no '>' header lines found")
            raise ValueError("FASTA content before first '>' header")
    n = np.int64(buf.size)
    if titles == "bytes":
        # two-walk plan/execute pipeline: ONE parallel pre-walk sizes
        # everything (records, residues, title bytes), ONE main walk emits
        # residues AND the spill-ready "title\n" stream
        nt = lib.oswald_fasta_num_chunks(n)
        cb = _ws_array(workspace, "cb", nt + 1, np.int64)
        rec_base = _ws_array(workspace, "rec_base", nt + 1, np.int64)
        w_base = _ws_array(workspace, "w_base", nt + 1, np.int64)
        t_base = _ws_array(workspace, "t_base", nt + 1, np.int64)
        sb = ctypes.c_int64(0)
        tb = ctypes.c_int64(0)
        nrec = lib.oswald_fasta_plan(
            _ptr(buf, ctypes.c_uint8), n, nt, _ptr(cb, ctypes.c_int64),
            _ptr(rec_base, ctypes.c_int64), _ptr(w_base, ctypes.c_int64),
            _ptr(t_base, ctypes.c_int64), ctypes.byref(sb),
            ctypes.byref(tb))
        seq = seq_alloc(max(sb.value, 1)) if seq_alloc is not None else None
        seq = seq.view(np.int8) if seq is not None else \
            _ws_array(workspace, "seq", max(sb.value, 1), np.int8)
        touts = titles_alloc(max(tb.value, 1)) \
            if titles_alloc is not None else None
        if touts is None:
            touts = _ws_array(workspace, "touts", max(tb.value, 1),
                              np.uint8)
        lengths = _ws_array(workspace, "lengths", max(nrec, 1), np.int64,
                            zero=True)
        hs = _ws_array(workspace, "hs", max(nrec, 1), np.int64, zero=True)
        he = _ws_array(workspace, "he", max(nrec, 1), np.int64, zero=True)
        wrote = lib.oswald_fasta_execute(
            _ptr(buf, ctypes.c_uint8), n, nt, _ptr(cb, ctypes.c_int64),
            _ptr(rec_base, ctypes.c_int64), _ptr(w_base, ctypes.c_int64),
            _ptr(t_base, ctypes.c_int64), _ptr(seq, ctypes.c_int8),
            _ptr(lengths, ctypes.c_int64), _ptr(hs, ctypes.c_int64),
            _ptr(he, ctypes.c_int64), _ptr(touts, ctypes.c_uint8))
        tw = tb
        out_titles = (touts[:tw.value] if workspace is not None else
                      touts[:tw.value].tobytes(), he[:nrec] - hs[:nrec])
        return out_titles, seq[:wrote], lengths[:nrec]
    ub = ctypes.c_int64(0)
    nrec = lib.oswald_fasta_count_mt(_ptr(buf, ctypes.c_uint8), n,
                                     ctypes.byref(ub))
    seq = seq_alloc(max(ub.value, 1)) if seq_alloc is not None else None
    if seq is not None:
        seq = seq.view(np.int8)
    else:
        seq = _ws_array(workspace, "seq", max(ub.value, 1), np.int8)
    lengths = _ws_array(workspace, "lengths", max(nrec, 1), np.int64,
                        zero=True)
    hs = _ws_array(workspace, "hs", max(nrec, 1), np.int64, zero=True)
    he = _ws_array(workspace, "he", max(nrec, 1), np.int64, zero=True)
    wrote = lib.oswald_fasta_encode_mt(
        _ptr(buf, ctypes.c_uint8), n, _ptr(seq, ctypes.c_int8),
        _ptr(lengths, ctypes.c_int64), _ptr(hs, ctypes.c_int64),
        _ptr(he, ctypes.c_int64))
    if titles == "list":
        hs, he = hs[:nrec], he[:nrec]
        out_titles = [bytes(buf[hs[i]:he[i]]).decode("utf-8",
                                                     errors="replace")
                      for i in range(nrec)]
    else:
        out_titles = None
    return out_titles, seq[:wrote], lengths[:nrec]


def pack_groups(seqs_flat, offsets, group_starts, padded_lengths):
    """Pack length-sorted sequences into [L_g, 1024] lane-major groups.

    seqs_flat:      int8[total] concatenated encoded residues (sorted order)
    offsets:        int64[n+1] per-sequence extents into seqs_flat
    group_starts:   int64[G+1] first sequence index of each group
    padded_lengths: int64[G]   padded length per group
    Returns a list of int8[L_g, 1024] arrays.
    """
    lib = _load()
    assert lib is not None, "native IO library not built (make -C native)"
    seqs_flat = np.ascontiguousarray(seqs_flat, np.int8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    group_starts = np.ascontiguousarray(group_starts, np.int64)
    Ls = np.ascontiguousarray(padded_lengths, np.int64)
    G = len(Ls)
    out_offsets = np.concatenate([[0], np.cumsum(Ls * 1024)]).astype(np.int64)
    outs = np.empty(int(out_offsets[-1]), np.int8)
    lib.oswald_pack_groups(
        _ptr(seqs_flat, ctypes.c_int8), _ptr(offsets, ctypes.c_int64),
        _ptr(group_starts, ctypes.c_int64), np.int64(G),
        _ptr(Ls, ctypes.c_int64), _ptr(outs, ctypes.c_int8),
        _ptr(out_offsets, ctypes.c_int64))
    return [outs[out_offsets[g]:out_offsets[g + 1]].reshape(int(Ls[g]), 1024)
            for g in range(G)]


def pack_groups_sl(seqs_flat, starts, lens, group_starts, padded_lengths,
                   out=None):
    """Like pack_groups but with per-sequence (start, len) extents, so the
    source can be a file-order staging array addressed through a sorted
    permutation (the out-of-core preprocess path; no permuted rewrite of
    the residue data is needed).

    out: optional preallocated int8[sum(L_g) * 1024] destination (e.g. a
    memmap slice) — written in group order.  Returns out (flat).
    """
    lib = _load()
    assert lib is not None, "native IO library not built (make -C native)"
    seqs_flat = np.ascontiguousarray(seqs_flat, np.int8)
    starts = np.ascontiguousarray(starts, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    group_starts = np.ascontiguousarray(group_starts, np.int64)
    Ls = np.ascontiguousarray(padded_lengths, np.int64)
    G = len(Ls)
    out_offsets = np.concatenate([[0], np.cumsum(Ls * 1024)]).astype(np.int64)
    if out is None:
        out = np.empty(int(out_offsets[-1]), np.int8)
    assert out.dtype == np.int8 and out.size == int(out_offsets[-1])
    lib.oswald_pack_groups_sl(
        _ptr(seqs_flat, ctypes.c_int8), _ptr(starts, ctypes.c_int64),
        _ptr(lens, ctypes.c_int64), _ptr(group_starts, ctypes.c_int64),
        np.int64(G), _ptr(Ls, ctypes.c_int64), _ptr(out, ctypes.c_int8),
        _ptr(out_offsets, ctypes.c_int64))
    return out


def gather_spans(src_buf, starts, lens, dst_off, out):
    """out[dst_off[k] : +lens[k]] = src_buf[starts[k] : +lens[k]] for all k
    (OpenMP memcpy per span); separators are whatever `out` holds."""
    lib = _load()
    assert lib is not None, "native IO library not built (make -C native)"
    src_buf = np.ascontiguousarray(src_buf, np.uint8)
    starts = np.ascontiguousarray(starts, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    dst_off = np.ascontiguousarray(dst_off, np.int64)
    assert out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
    lib.oswald_gather_spans(
        _ptr(src_buf, ctypes.c_uint8), _ptr(starts, ctypes.c_int64),
        _ptr(lens, ctypes.c_int64), _ptr(dst_off, ctypes.c_int64),
        np.int64(len(starts)), _ptr(out, ctypes.c_uint8))
    return out
