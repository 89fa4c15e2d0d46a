"""Compile-cache lab: measure first-deploy vs restarted-deployment warmup.

The reference loads a precompiled sw.aocx at startup
(/root/reference/host/src/utils.c:144-150) so deployments never pay FPGA
synthesis; oswald-tpu's analog is JAX's persistent compilation cache
(oswald_tpu/utils/compile_cache.py).  This lab runs the REAL deployment
sequence — engine build + the default serving warmup ladder — twice in
separate processes against one cache directory:

  run 1 (cold, fresh dir):   every program compiles through the service
  run 2 (warm, same dir):    every program loads from the cache

Usage:
  python scripts/cache_lab.py --cache-dir /tmp/oswald_cache_lab \
      [--seqs 50000] [--warmup-qlen 512] [--no-batch]

Run it twice; the second invocation is the restart measurement.  Results
are recorded in SCALING.md.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cache-dir", required=True)
    p.add_argument("--seqs", type=int, default=50_000)
    p.add_argument("--mean-len", type=int, default=256)
    p.add_argument("--warmup-qlen", type=int, default=512)
    p.add_argument("--no-batch", action="store_true",
                   help="skip the packed/batched warmup rungs")
    p.add_argument("--jobs", type=int, default=1,
                   help="parallel warmup steps (warmup_engine jobs)")
    args = p.parse_args()

    from oswald_tpu.utils.compile_cache import (enable_compile_cache,
                                                cache_stats)
    st0 = cache_stats(args.cache_dir)
    enable_compile_cache(args.cache_dir)

    import jax
    from oswald_tpu.io import pack_sequences
    from oswald_tpu.engine import SearchEngine, SearchConfig

    rng = np.random.default_rng(0)
    lengths = np.clip(
        rng.lognormal(np.log(args.mean_len), 0.45, args.seqs)
        .astype(np.int64), 32, 4 * args.mean_len)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    db = pack_sequences(flat, lengths,
                        [f"s{i}" for i in range(args.seqs)])

    t0 = time.perf_counter()
    eng = SearchEngine(db, SearchConfig())
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    eng.warmup(max_query_len=args.warmup_qlen, batch=not args.no_batch,
               log=lambda m: print(m, file=sys.stderr), jobs=args.jobs)
    warmup_s = time.perf_counter() - t0

    # one real post-warmup search to prove the deployment is live
    q = rng.integers(0, 23, size=256).astype(np.int8)
    t0 = time.perf_counter()
    res = eng.search(q)
    search_s = time.perf_counter() - t0

    st1 = cache_stats(args.cache_dir)
    print(json.dumps({
        "backend": jax.default_backend(),
        "cold_start": st0["entries"] == 0,
        "setup_s": round(setup_s, 2),
        "warmup_s": round(warmup_s, 2),
        "post_warmup_search_s": round(search_s, 4),
        "top1": int(res.scores[0]),
        "cache_entries_before": st0["entries"],
        "cache_entries_after": st1["entries"],
        "cache_mb": round(st1["bytes"] / 2**20, 1),
    }))


if __name__ == "__main__":
    main()
