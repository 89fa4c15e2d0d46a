"""Short-query pipelined-stream regression lab (VERDICT r4 weak item 3).

Round 3 measured the 8-query qlen-64 pipelined stream at 194.4 GCUPS
with per-bin dispatch; round 4 recorded 171-185 after fused dispatch
became the single-query default.  This lab A/Bs fused vs per-bin
dispatch under `search_stream` (and single queries) on the attached
backend to attribute the regression.

Run: python scripts/shortq_lab.py [--seqs N]
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
    return pack_sequences(flat, lengths,
                          [f"s{i}" for i in range(n_seqs)])


def t_min(f, iters=5):
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
    p.add_argument("--qlen", type=int, default=64)
    p.add_argument("--nq", type=int, default=8)
    args = p.parse_args()
    enable_compile_cache()
    rng = np.random.default_rng(0)
    db = make_db(args.seqs, args.mean_len, rng)
    D = db.n_residues
    print(json.dumps({"n_seqs": db.n_seqs, "db_residues": D}))

    qs = [rng.integers(0, 23, size=args.qlen).astype(np.int8)
          for _ in range(args.nq)]
    cells = args.nq * args.qlen * D

    for fused in (True, False):
        eng = SearchEngine(db, SearchConfig(fused_dispatch=fused))
        for q in qs:
            eng.search(q)                     # compile both variants' rungs
        dt_stream = t_min(lambda: eng.search_stream(qs))
        dt_single = t_min(lambda: eng.search(qs[0]))
        row = {"fused": fused,
               "stream_gcups": round(cells / dt_stream / 1e9, 1),
               "stream_s": round(dt_stream, 4),
               "single_gcups": round(args.qlen * D / dt_single / 1e9, 1),
               "single_s": round(dt_single, 4)}
        # split the per-query cost: dispatch-only (no readback) vs full,
        # and the pure host-side finish cost
        pend = eng._dispatch(qs[0], "t")
        eng._finish(pend)
        dt_disp = t_min(lambda: eng._dispatch(qs[0], "t"))
        row["dispatch_only_s"] = round(dt_disp, 4)
        pend = eng._dispatch(qs[0], "t")
        import numpy as _np
        arr = _np.asarray(pend[3])            # block
        t0 = time.perf_counter()
        for _ in range(20):
            eng._finish((qs[0], "t", time.perf_counter(), pend[3], pend[4]))
        row["finish_host_s"] = round((time.perf_counter() - t0) / 20, 5)
        print(json.dumps(row))
        del eng


if __name__ == "__main__":
    main()


def window_sweep(seqs=300_000, mean_len=256, qlen=64, nq=8):
    """Round-5 readback-window sweep: GCUPS of the nq-query pipelined
    stream vs stream_readback_window."""
    enable_compile_cache()
    rng = np.random.default_rng(0)
    db = make_db(seqs, mean_len, rng)
    D = db.n_residues
    qs = [rng.integers(0, 23, size=qlen).astype(np.int8)
          for _ in range(nq)]
    cells = nq * qlen * D
    for w in (1, 2, 4, 8):
        eng = SearchEngine(db, SearchConfig(stream_readback_window=w))
        eng.search_stream(qs)                 # compile
        dt = t_min(lambda: eng.search_stream(qs))
        print(json.dumps({"window": w, "qlen": qlen, "nq": nq,
                          "stream_gcups": round(cells / dt / 1e9, 1),
                          "stream_s": round(dt, 4)}))
        del eng
