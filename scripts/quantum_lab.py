"""LENGTH_QUANTUM experiment: 64- vs 32-residue bin granularity.

pad_overhead at the headline db is 1.12 (BENCH_r03) with the 64 quantum;
a 32 quantum halves tail padding but doubles candidate tail-chunk shapes
(the kernel streams full 128-wide chunks plus one 32/64/96-wide tail) and
finer bins mean more bins (more dispatches, more compiled shapes).  This
lab measures the real trade on the attached device: pad overhead, bin
count, and end-to-end single-query + batch GCUPS at both quanta, with a
top-k parity cross-check between the two engines (same database, so the
results must be identical).

Usage: python scripts/quantum_lab.py [--seqs 300000] [--qlen 512]
"""

import os
import sys

# repo-root import shim (PYTHONPATH must keep /root/.axon_site first
# for the TPU plugin, so scripts self-shim instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax

# honor JAX_PLATFORMS=cpu despite the early sitecustomize jax import
# (same dance as bench.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def build_db(quantum, n_seqs, mean_len, rng):
    import oswald_tpu.io.db as iodb
    old = iodb.LENGTH_QUANTUM
    iodb.LENGTH_QUANTUM = quantum
    try:
        lengths = np.clip(
            rng.lognormal(np.log(mean_len), 0.45, n_seqs).astype(np.int64),
            32, 4 * mean_len)
        flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
        return iodb.pack_sequences(flat, lengths,
                                   [f"s{i}" for i in range(n_seqs)])
    finally:
        iodb.LENGTH_QUANTUM = old


def measure(db, qlen, rng, iters=3):
    from oswald_tpu.engine import SearchEngine, SearchConfig
    eng = SearchEngine(db, SearchConfig(top=10))
    q = rng.integers(0, 23, size=qlen).astype(np.int8)
    eng.search(q)                       # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        res = eng.search(q)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    queries = [rng.integers(0, 23, size=qlen).astype(np.int8)
               for _ in range(10)]
    eng.search_many(queries)            # compile
    t0 = time.perf_counter()
    eng.search_many(queries)
    bdt = time.perf_counter() - t0
    padded = sum(db.bins[L]["seq"].shape[0] * L * 1024
                 for L in db.bin_lengths)
    return {
        "bins": len(db.bin_lengths),
        "pad_overhead": round(padded / db.n_residues, 4),
        "single_gcups": round(qlen * db.n_residues / dt / 1e9, 2),
        "batch10_gcups": round(10 * qlen * db.n_residues / bdt / 1e9, 2),
    }, res, eng


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqs", type=int, default=300_000)
    p.add_argument("--mean-len", type=int, default=256)
    p.add_argument("--qlen", type=int, default=512)
    args = p.parse_args()
    rng = np.random.default_rng(0)

    out = {}
    res_by_q = {}
    for quantum in (64, 32):
        rng_q = np.random.default_rng(0)       # same sequences both ways
        db = build_db(quantum, args.seqs, args.mean_len, rng_q)
        m, res, eng = measure(db, args.qlen, np.random.default_rng(1))
        out[f"q{quantum}"] = m
        res_by_q[quantum] = (res.scores.tolist(), res.seq_ids.tolist())
        print(json.dumps({"quantum": quantum, **m}), file=sys.stderr)
        del db, eng

    # identical database, identical query: the two quanta must agree on
    # scores (ids are sorted-order and the sort is identical)
    assert res_by_q[64][0] == res_by_q[32][0], "quantum changed scores!"
    out["parity"] = "scores identical across quanta"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
