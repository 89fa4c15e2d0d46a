"""Out-of-core database preprocessing for huge FASTA files.

`preprocess_db_streaming` builds the same `.oswt` artifact as
`oswald_tpu.io.db.preprocess_db` but never holds the FASTA or the packed
database in RAM: the file is scanned in record-aligned blocks (two passes)
and packed residues are scattered straight into np.memmap-backed bin files.
Peak host memory is O(block) + O(n_seqs) index arrays — an
Environmental-NR-scale database (BASELINE.json config 5, ~100M sequences,
tens of GB of FASTA) preprocesses on a host with a few GB of RAM.

Pass structure (the reference's preprocess is also multi-pass over the
file, /root/reference/host/src/sequences.c:28-119; it holds everything in
RAM because its target databases fit):

  pass 1: stream blocks -> per-record lengths + titles (titles spill to
          the output .desc-analog file immediately)
  sort:   argsort of the length array (RAM: 8 bytes/sequence)
  plan:   group/bin geometry from sorted lengths (oswald_tpu.io.db rules:
          1024-lane groups, 64-quantum lengths, bin-partition DP)
  pass 2: stream blocks again -> encode -> scatter each sequence's
          residues into its (bin, group, position, lane) via np.memmap
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


def _parse_block(data: bytes):
    from oswald_tpu.io import native
    if native.available() and not os.environ.get("OSWALD_NO_NATIVE"):
        return native.parse_fasta_bytes(data)
    from oswald_tpu.io.fasta import parse_fasta_bytes
    return parse_fasta_bytes(data)


def preprocess_db_streaming(fasta_path: str, out_path: str,
                            block_bytes: int = DEFAULT_BLOCK,
                            bin_cost: int = _BIN_COST_RESIDUES,
                            verbose: bool = True) -> PackedDB:
    """FASTA -> packed on-disk database, bounded-memory. Returns the
    loaded (memory-mapped) PackedDB."""
    import time
    t0 = time.perf_counter()
    d = out_path + ".oswt"
    os.makedirs(d, exist_ok=True)

    # ---- pass 1: lengths + titles (record order, spilled to a temp file;
    # rewritten in sorted order after the sort) ----
    lengths = []
    tmp_titles = os.path.join(d, "titles.tmp")
    toffs = [0]
    with open(tmp_titles, "wb") as tf:
        pos = 0
        for block in _iter_blocks(fasta_path, block_bytes):
            titles, _, ls = _parse_block(block)
            lengths.append(np.asarray(ls, np.int64))
            for t in titles:
                b = t.encode("utf-8")
                tf.write(b)
                pos += len(b)
                toffs.append(pos)
    lengths = np.concatenate(lengths) if lengths else np.zeros(0, np.int64)
    n = len(lengths)
    toffs = np.asarray(toffs, np.int64)

    # ---- sort + geometry plan ----
    order = np.argsort(lengths, kind="stable")       # ascending by length
    rank = np.empty(n, np.int64)                     # record -> sorted pos
    rank[order] = np.arange(n)
    sorted_lengths = lengths[order]

    with open(tmp_titles, "rb") as tf:
        tbuf = np.memmap(tf, dtype=np.uint8, mode="r") if toffs[-1] else \
            np.zeros(0, np.uint8)
        sorted_offs = [0]
        with open(os.path.join(d, "titles.txt"), "wb") as out:
            for i, src in enumerate(order):
                if i:
                    out.write(b"\n")
                out.write(tbuf[toffs[src]:toffs[src + 1]].tobytes())
                sorted_offs.append(out.tell())
    os.remove(tmp_titles)
    np.save(os.path.join(d, "titles_idx.npy"),
            np.asarray(sorted_offs, np.int64))

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
    # memmap per bin seq array + id/len arrays in RAM (small)
    mm = {}
    for L, gs in bins.items():
        Gb = len(gs)
        mm[L] = np.lib.format.open_memmap(
            os.path.join(d, f"bin{L}_seq.npy"), mode="w+", dtype=np.int8,
            shape=(Gb, L, SUBLANES, LANES))
        mm[L][:] = DUMMY
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
    # group -> (bin L, index within bin), as arrays for vectorized lookup
    group_L_arr = np.zeros(max(n_groups, 1), np.int64)
    group_bg_arr = np.zeros(max(n_groups, 1), np.int64)
    for L, gs in bins.items():
        for bg, g in enumerate(gs):
            group_L_arr[g] = L
            group_bg_arr[g] = bg

    # ---- pass 2: encode + scatter (vectorized per block) ----
    rec = 0
    for block in _iter_blocks(fasta_path, block_bytes):
        _, flat, ls = _parse_block(block)
        nb = len(ls)
        # per-record destination coordinates
        kk = rank[rec:rec + nb]
        g, slot = kk // GROUP_LANES, kk % GROUP_LANES
        Lr = group_L_arr[g]
        bg = group_bg_arr[g]
        sub, lane = slot // LANES, slot % LANES
        # per-residue flat index into the destination bin's memmap
        ridx = np.repeat(np.arange(nb), ls)
        p = _ragged_arange(ls)
        flat_idx = (((bg[ridx] * Lr[ridx] + p) * SUBLANES + sub[ridx])
                    * LANES + lane[ridx])
        Lres = Lr[ridx]
        for L in np.unique(Lr):
            m = Lres == L
            mm[int(L)].reshape(-1)[flat_idx[m]] = flat[m]
        rec += nb
    assert rec == n, (rec, n)
    for m in mm.values():
        m.flush()

    np.save(os.path.join(d, "lengths.npy"), sorted_lengths)
    meta = {"version": FORMAT_VERSION, "n_seqs": n,
            "n_residues": int(lengths.sum()),
            "bins": sorted(bins.keys()), "group_lanes": GROUP_LANES}
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)

    if verbose:
        dt = time.perf_counter() - t0
        print(f"oswald-tpu preprocess (streaming): {n} sequences "
              f"({meta['n_residues']} residues) -> {d} "
              f"[bins: {', '.join(map(str, sorted(bins)))}] in {dt:.2f}s")
    return load_db(out_path)
