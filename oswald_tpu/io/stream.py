"""Out-of-core database preprocessing for huge FASTA files.

`preprocess_db_streaming` builds the same `.oswt` artifact as
`oswald_tpu.io.db.preprocess_db` but never holds the FASTA or the packed
database in RAM.  Peak host memory is O(block) + O(n_seqs) index arrays —
an Environmental-NR-scale database (BASELINE.json config 5, ~100M
sequences, tens of GB of FASTA) preprocesses on a host with a few GB of
RAM.

Structure (the reference's preprocess scans its file three times and
holds everything in RAM, /root/reference/host/src/sequences.c:28-119;
here the FASTA is read ONCE, through a read-ahead thread):

  scan:   stream record-aligned blocks -> the native OpenMP scanner
          emits per-record lengths, title bytes (spilled to a temp file)
          and encoded residues (spilled to a file-order staging file) in
          one walk per block
  sort:   argsort of the length array (RAM: 8 bytes/sequence)
  titles: rewrite the title spill in sorted order (OpenMP span gather)
  plan:   group/bin geometry from sorted lengths (oswald_tpu.io.db rules:
          1024-lane groups, 64-quantum lengths, bin-partition DP)
  pack:   gather each group's records from the staging file through the
          sorted permutation straight into the np.memmap'd bin files
          (OpenMP position-major packer)
"""

import json
import os

import numpy as np

from oswald_tpu.alphabet import DUMMY
from oswald_tpu.io.db import (
    GROUP_LANES, SUBLANES, LANES, LENGTH_QUANTUM, FORMAT_VERSION,
    _round_up, _partition_bins, _ragged_arange, _BIN_COST_RESIDUES,
    PackedDB, load_db,
)

DEFAULT_BLOCK = 256 * 1024 * 1024


def _iter_blocks(path: str, block_bytes: int):
    """Yield FASTA blocks split at record boundaries ('\\n>')."""
    with open(path, "rb") as f:
        carry = b""
        while True:
            buf = f.read(block_bytes)
            if not buf:
                if carry:
                    yield carry
                return
            buf = carry + buf
            # cut at the LAST record start so records never straddle blocks
            cut = buf.rfind(b"\n>")
            if cut < 0:
                carry = buf
                continue
            yield buf[:cut + 1]
            carry = buf[cut + 1:]


def _iter_blocks_prefetch(path: str, block_bytes: int, depth: int = 2):
    """_iter_blocks through a reader thread: the next block's file read
    (and the GIL-free part of its split) overlaps the current block's
    parse/pack — file IO and the native scan both release the GIL.

    If the consumer abandons the generator (an exception mid-preprocess),
    the stop event unblocks the reader so it exits and closes the file
    instead of parking forever on a full queue."""
    import queue
    import threading
    q = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def reader():
        try:
            for b in _iter_blocks(path, block_bytes):
                if not _put(b):
                    return
            _put(None)
        except BaseException as e:        # surface IO errors in the consumer
            _put(e)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def _parse_block(data: bytes, titles: str | None = "list"):
    from oswald_tpu.io import native
    if native.available() and not os.environ.get("OSWALD_NO_NATIVE"):
        return native.parse_fasta_bytes(data, titles=titles)
    from oswald_tpu.io.fasta import parse_fasta_bytes
    return parse_fasta_bytes(data, titles=titles)


def preprocess_db_streaming(fasta_path: str, out_path: str,
                            block_bytes: int = DEFAULT_BLOCK,
                            bin_cost: int = _BIN_COST_RESIDUES,
                            verbose: bool = True) -> PackedDB:
    """FASTA -> packed on-disk database, bounded-memory. Returns the
    loaded (memory-mapped) PackedDB."""
    import time
    t0 = time.perf_counter()
    phase_t = {}

    def _mark(name, t_start):
        phase_t[name] = phase_t.get(name, 0.0) + time.perf_counter() \
            - t_start
        return time.perf_counter()

    d = out_path + ".oswt"
    os.makedirs(d, exist_ok=True)
    from oswald_tpu.io import native
    use_native = native.available() and \
        not os.environ.get("OSWALD_NO_NATIVE")

    # ---- pass 1 (the ONLY read of the FASTA): parse blocks -> lengths,
    # title bytes (spilled to a temp file), encoded residues (spilled to a
    # file-order staging file).  No per-record Python loop anywhere. ----
    lengths = []
    tmp_titles = os.path.join(d, "titles.tmp")
    tmp_resid = os.path.join(d, "residues.tmp")
    tlen_parts = []
    t = time.perf_counter()
    with open(tmp_titles, "wb") as tf, open(tmp_resid, "wb") as rf:
        for block in _iter_blocks_prefetch(fasta_path, block_bytes):
            t = _mark("read1", t)
            (tjoined, tlens), flat, ls = _parse_block(block, titles="bytes")
            lengths.append(np.asarray(ls, np.int64))
            tlen_parts.append(tlens)
            tf.write(tjoined)                 # each title + b"\n"
            rf.write(memoryview(np.ascontiguousarray(flat)))
            t = _mark("parse1", t)
    lengths = np.concatenate(lengths) if lengths else np.zeros(0, np.int64)
    n = len(lengths)
    tlens = np.concatenate(tlen_parts) if tlen_parts else \
        np.zeros(0, np.int64)
    # extents into the tmp file ("title\n" stride)
    tends = np.cumsum(tlens + 1) - 1
    tstarts = tends - tlens

    # ---- sort + geometry plan ----
    t = time.perf_counter()
    order = np.argsort(lengths, kind="stable")       # ascending by length
    sorted_lengths = lengths[order]

    # sorted titles.txt ("\n"-joined, no trailing separator — save_db's
    # format) + end-offset index, gathered chunk-wise (bounded memory;
    # native OpenMP span-copy, numpy scatter fallback — the original
    # per-title Python loop dominated pass 1)
    sorted_offs = np.zeros(n + 1, np.int64)
    with open(tmp_titles, "rb") as tf:
        tbuf = np.memmap(tf, dtype=np.uint8, mode="r") if n else \
            np.zeros(0, np.uint8)
        with open(os.path.join(d, "titles.txt"), "wb") as out:
            pos_out = 0
            CH = 1 << 20                      # titles per chunk
            for c0 in range(0, n, CH):
                src = order[c0:c0 + CH]
                lt = tlens[src]
                sep = np.ones(len(src), np.int64)
                if c0 == 0:
                    sep[0] = 0                # no separator before title 0
                widths = lt + sep
                dst0 = np.cumsum(widths) - widths + sep
                buf_out = np.full(int(widths.sum()), ord("\n"), np.uint8)
                if use_native:
                    native.gather_spans(tbuf, tstarts[src], lt, dst0,
                                        buf_out)
                else:
                    dst = np.repeat(dst0, lt) + _ragged_arange(lt)
                    gsrc = np.repeat(tstarts[src], lt) + _ragged_arange(lt)
                    buf_out[dst] = tbuf[gsrc]
                out.write(buf_out.tobytes())
                sorted_offs[c0 + 1:c0 + len(src) + 1] = pos_out + dst0 + lt
                pos_out += int(widths.sum())
    os.remove(tmp_titles)
    np.save(os.path.join(d, "titles_idx.npy"), sorted_offs)
    t = _mark("sort_titles", t)

    n_groups = -(-n // GROUP_LANES) if n else 0
    group_Ls = []
    for g in range(n_groups):
        lo, hi = g * GROUP_LANES, min((g + 1) * GROUP_LANES, n)
        group_Ls.append(_round_up(max(int(sorted_lengths[lo:hi].max()), 1),
                                  LENGTH_QUANTUM))
    group_Ls = _partition_bins(group_Ls, [GROUP_LANES] * n_groups, bin_cost)

    # bins: ordered dict L -> list of group indices (ascending runs)
    bins = {}
    for g, L in enumerate(group_Ls):
        bins.setdefault(L, []).append(g)
    # memmap per bin seq array + id/len arrays in RAM (small); no DUMMY
    # prefill — the pack phase memsets every group block itself
    mm = {}
    for L, gs in bins.items():
        Gb = len(gs)
        mm[L] = np.lib.format.open_memmap(
            os.path.join(d, f"bin{L}_seq.npy"), mode="w+", dtype=np.int8,
            shape=(Gb, L, SUBLANES, LANES))
        lens = np.zeros((Gb, GROUP_LANES), np.int32)
        ids = np.full((Gb, GROUP_LANES), -1, np.int32)
        for bg, g in enumerate(gs):
            lo, hi = g * GROUP_LANES, min((g + 1) * GROUP_LANES, n)
            cnt = hi - lo
            lens[bg, :cnt] = sorted_lengths[lo:hi]
            ids[bg, :cnt] = np.arange(lo, hi)
        np.save(os.path.join(d, f"bin{L}_len.npy"),
                lens.reshape(Gb, SUBLANES, LANES))
        np.save(os.path.join(d, f"bin{L}_id.npy"),
                ids.reshape(Gb, SUBLANES, LANES))
    t = _mark("alloc_bins", t)

    # ---- pack: gather each group's records straight out of the
    # FILE-ORDER staging area through the sorted permutation (per-record
    # contiguous reads -- no permuted rewrite of the residue data), packed
    # into the [L, 8, 128] lane tiles by the OpenMP native packer (numpy
    # fallback below), chunked to bound RAM ----
    starts_file = np.concatenate([[0], np.cumsum(lengths)])
    staging = np.memmap(tmp_resid, dtype=np.int8, mode="r") \
        if starts_file[-1] else np.zeros(0, np.int8)
    for L, gs in bins.items():
        Gb = len(gs)
        g0 = gs[0]
        # ascending lengths => nondecreasing group Ls => each bin's groups
        # are one consecutive run
        assert gs == list(range(g0, g0 + Gb)), (L, gs[:3], gs[-3:])
        CHG = max(1, (256 << 20) // (L * GROUP_LANES))
        for b0 in range(0, Gb, CHG):
            ng = min(CHG, Gb - b0)
            lo_seq = (g0 + b0) * GROUP_LANES
            hi_seq = min((g0 + b0 + ng) * GROUP_LANES, n)
            cnt = hi_seq - lo_seq
            ksel = order[lo_seq:hi_seq]
            starts = starts_file[ksel]
            lens_sel = lengths[ksel]          # == sorted_lengths slice
            gstarts = np.minimum(np.arange(ng + 1) * GROUP_LANES, cnt)
            if use_native:
                native.pack_groups_sl(
                    staging, starts, lens_sel, gstarts, [L] * ng,
                    out=mm[L][b0:b0 + ng].reshape(-1))
            else:
                buf = np.full((ng, L, GROUP_LANES), DUMMY, np.int8)
                lcl = np.minimum(lens_sel, L)
                p = _ragged_arange(lcl)
                src = np.repeat(starts, lcl) + p
                kloc = np.arange(cnt)
                lane_i = (kloc % GROUP_LANES).repeat(lcl)
                grp_i = (kloc // GROUP_LANES).repeat(lcl)
                dest = (grp_i * L + p) * GROUP_LANES + lane_i
                buf.reshape(-1)[dest] = staging[src]
                mm[L][b0:b0 + ng] = buf.reshape(ng, L, SUBLANES, LANES)
    for m in mm.values():
        m.flush()
    os.remove(tmp_resid)
    t = _mark("pack", t)

    np.save(os.path.join(d, "lengths.npy"), sorted_lengths)
    meta = {"version": FORMAT_VERSION, "n_seqs": n,
            "n_residues": int(lengths.sum()),
            "bins": sorted(bins.keys()), "group_lanes": GROUP_LANES}
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)

    if verbose:
        dt = time.perf_counter() - t0
        phases = " ".join(f"{k}={v:.1f}s" for k, v in phase_t.items())
        print(f"oswald-tpu preprocess (streaming): {n} sequences "
              f"({meta['n_residues']} residues) -> {d} "
              f"[bins: {', '.join(map(str, sorted(bins)))}] in {dt:.2f}s "
              f"({phases})")
    return load_db(out_path)
