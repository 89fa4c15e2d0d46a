"""host_stream coalescing lab (round 5, VERDICT r4 item 2).

Measures on the attached backend: the coalesced-slice host_stream sweep
(GCUPS + transfer/compute overlap A/B) at several slice budgets, and the
one-sweep batched path.

Run: python scripts/hs_lab.py [--seqs N] [--qlen M]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig
from oswald_tpu.utils.compile_cache import enable_compile_cache


def make_db(n_seqs, mean_len, rng):
    lengths = np.clip(
        rng.lognormal(np.log(mean_len), 0.45, n_seqs).astype(np.int64),
        32, 4 * mean_len)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    return pack_sequences(flat, lengths, [f"s{i}" for i in range(n_seqs)])


def t_min(f, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqs", type=int, default=300_000)
    p.add_argument("--mean-len", type=int, default=256)
    p.add_argument("--qlen", type=int, default=2048)
    args = p.parse_args()
    enable_compile_cache()
    rng = np.random.default_rng(0)
    db = make_db(args.seqs, args.mean_len, rng)
    D = db.n_residues
    q = rng.integers(0, 23, size=args.qlen).astype(np.int8)
    print(json.dumps({"n_seqs": db.n_seqs, "db_residues": D,
                      "qlen": args.qlen}))
    for slice_mb in (256, 16):
        ov = SearchEngine(db, SearchConfig(
            profile_mode="host_stream", host_stream_slice_mb=slice_mb))
        n_slices = len(ov._hs_slices)
        spans = sum(len(s) for _, s in ov._hs_slices)
        ov.search(q)
        dt_ov = t_min(lambda: ov.search(q))
        del ov
        ser = SearchEngine(db, SearchConfig(
            profile_mode="host_stream", host_stream_slice_mb=slice_mb,
            host_stream_overlap=False))
        ser.search(q)
        dt_ser = t_min(lambda: ser.search(q))
        del ser
        print(json.dumps({
            "slice_mb": slice_mb, "slices": n_slices, "spans": spans,
            "gcups_overlap": round(args.qlen * D / dt_ov / 1e9, 1),
            "overlap_s": round(dt_ov, 3),
            "serial_s": round(dt_ser, 3),
            "overlap_ratio": round(dt_ser / dt_ov, 3)}))
    # batched one-sweep: 4 mixed-length queries, one database sweep
    hs = SearchEngine(db, SearchConfig(profile_mode="host_stream"))
    qs = [rng.integers(0, 23, size=m).astype(np.int8)
          for m in (256, 300, 1024, 2048)]
    hs.search_many(qs)
    dt_b = t_min(lambda: hs.search_many(qs))
    cells = sum(len(x) for x in qs) * D
    print(json.dumps({"config": "hs_batch_one_sweep", "nq": len(qs),
                      "batch_s": round(dt_b, 3),
                      "gcups": round(cells / dt_b / 1e9, 1)}))


if __name__ == "__main__":
    main()
