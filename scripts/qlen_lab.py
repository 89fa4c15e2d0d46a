"""Short-query latency/crossover lab (VERDICT r2 item 2).

Measures, on the attached backend:
  1. the raw device round-trip latency (tiny transfer + tiny program),
  2. per-qlen single-query timing for precompute vs stream residency
     (the planner crossover data),
  3. the compute/readback split of a short-query search (dispatch, block
     on device, then host transfer),
  4. a pipelined single-query stream (dispatch query i+1 before reading
     query i) — what a production client that doesn't serialise on each
     readback actually sees.

Run: python scripts/qlen_lab.py [--seqs N]
"""

import argparse
import json
import os
import sys
import time

# NOTE: do NOT use PYTHONPATH=/root/repo for these scripts — preloading
# the repo path at interpreter start breaks the axon TPU plugin's backend
# discovery.  A sys.path shim after startup is safe.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig


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
    args = p.parse_args()
    rng = np.random.default_rng(0)
    db = make_db(args.seqs, args.mean_len, rng)
    D = db.n_residues
    print(json.dumps({"n_seqs": db.n_seqs, "db_residues": D}))

    # 1. raw round-trip costs.  NOTE: under the axon tunnel
    # block_until_ready can return early — a host transfer (np.asarray)
    # is the only reliable sync, so every timing below ends in one.
    tiny = jnp.zeros((2, 12), jnp.int32)
    inc = jax.jit(lambda x: x + 1)
    np.asarray(inc(tiny))
    rtt_read = t_min(lambda: np.asarray(inc(tiny)), 10)
    put_read = t_min(lambda: np.asarray(
        jax.device_put(np.zeros((2, 12), np.int32))), 10)
    print(json.dumps({"rtt_dispatch_plus_readback_s": round(rtt_read, 5),
                      "rtt_put_plus_readback_s": round(put_read, 5)}))

    # 2+3. per-qlen single query, precompute vs stream
    engines = {}
    for mode in ("precompute", "stream"):
        engines[mode] = SearchEngine(db, SearchConfig(profile_mode=mode))
    for qlen in (64, 128, 256, 512, 1024):
        q = rng.integers(0, 23, size=qlen).astype(np.int8)
        row = {"qlen": qlen}
        for mode, eng in engines.items():
            eng.search(q)
            dt = t_min(lambda: eng.search(q))
            row[mode] = round(qlen * D / dt / 1e9, 1)
            row[mode + "_s"] = round(dt, 4)
        # dispatch-only vs full cost (precompute, fused path when active);
        # compute+rtt = full - dispatch, and the pipelined experiment
        # below bounds the rtt share empirically
        eng = engines["precompute"]
        k = min(eng.config.top, db.n_seqs)
        q_pad = jnp.asarray(eng._pad_query(q))
        if eng.mode == "precompute" and q_pad.shape[0] <= 128:
            f = eng._search_fn(k)
            stacks = (eng.prof_flat, eng.tail_flats)
            # nb=None: these qlens fill their pad class (branch-free
            # kernel variant; see sw_chunk n_blocks)
            args_f = (q_pad, None, eng.gaps, eng.submat_dev, stacks,
                      eng.valid, eng.lnl)
            np.asarray(f(*args_f))
            t_disp = t_min(lambda: f(*args_f))                  # dispatch
            t_full = t_min(lambda: np.asarray(f(*args_f)))
            row["dispatch_s"] = round(t_disp, 4)
            row["full_s"] = round(t_full, 4)
        print(json.dumps(row))

    # 4. pipelined single-query stream at qlen 64 (8 distinct queries):
    # dispatch all, then drain — overlaps each query's readback latency
    # under the next query's compute
    eng = engines["precompute"]
    k = min(eng.config.top, db.n_seqs)
    qs = [rng.integers(0, 23, size=64).astype(np.int8) for _ in range(8)]
    for q in qs[:1]:
        eng.search(q)                       # compile
    f = eng._search_fn(k)
    stacks = (eng.prof_flat, eng.tail_flats)

    def pipelined():
        outs = [f(jnp.asarray(eng._pad_query(q)), None, eng.gaps,
                  eng.submat_dev, stacks, eng.valid, eng.lnl) for q in qs]
        return [np.asarray(o) for o in outs]

    def serial():
        return [np.asarray(f(jnp.asarray(eng._pad_query(q)), None,
                             eng.gaps, eng.submat_dev, stacks, eng.valid,
                             eng.lnl)) for q in qs]

    def threaded():
        # dispatch all, then drain with CONCURRENT readbacks: does the
        # tunnel multiplex transfers, or are RTTs serial either way?
        from concurrent.futures import ThreadPoolExecutor
        outs = [f(jnp.asarray(eng._pad_query(q)), None, eng.gaps,
                  eng.submat_dev, stacks, eng.valid, eng.lnl) for q in qs]
        with ThreadPoolExecutor(8) as ex:
            return list(ex.map(np.asarray, outs))

    pipelined()
    dt_p = t_min(pipelined)
    dt_s = t_min(serial)
    dt_t = t_min(threaded)
    print(json.dumps({
        "pipelined_8x_qlen64_gcups": round(8 * 64 * D / dt_p / 1e9, 1),
        "serial_8x_qlen64_gcups": round(8 * 64 * D / dt_s / 1e9, 1),
        "threaded_drain_gcups": round(8 * 64 * D / dt_t / 1e9, 1),
        "pipelined_s": round(dt_p, 4), "serial_s": round(dt_s, 4),
        "threaded_s": round(dt_t, 4)}))


if __name__ == "__main__":
    main()
