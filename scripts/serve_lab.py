"""Serving-throughput lab: concurrent HTTP clients vs sequential.

Measures the cross-request micro-batching win on the attached backend
(round 3: 309.7 vs 273.3 GCUPS; round 4: 352.2 vs 297.6).

Run: python scripts/serve_lab.py [--seqs N] [--clients C] [--reqs R]
"""

import argparse
import json
import os
import socket
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig
from oswald_tpu.serve import make_server, SearchService
from oswald_tpu.alphabet import decode
from oswald_tpu.utils.compile_cache import enable_compile_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqs", type=int, default=300_000)
    p.add_argument("--mean-len", type=int, default=256)
    p.add_argument("--qlen", type=int, default=512)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--reqs", type=int, default=4)   # per client
    args = p.parse_args()
    enable_compile_cache()
    rng = np.random.default_rng(0)
    lengths = np.clip(
        rng.lognormal(np.log(args.mean_len), 0.45, args.seqs)
        .astype(np.int64), 32, 4 * args.mean_len)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    db = pack_sequences(flat, lengths,
                        [f"s{i}" for i in range(args.seqs)])
    eng = SearchEngine(db, SearchConfig())
    srv = make_server(SearchService(db, eng), "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    D = db.n_residues
    queries = [decode(rng.integers(0, 23, args.qlen).astype(np.int8))
               for _ in range(args.clients * args.reqs)]

    def post(q):
        body = json.dumps({"query": q}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    post(queries[0])                       # compile/warm the 512 rungs
    # sequential
    t0 = time.perf_counter()
    for q in queries:
        post(q)
    dt_seq = time.perf_counter() - t0
    # concurrent: burst 1 may compile its micro-batch pack rungs cold
    # (a production serve warms them via engine.warmup — skipped here to
    # keep the lab short); burst 2 is the steady state
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(args.clients) as ex:
        list(ex.map(post, queries))
    t0 = time.perf_counter()
    with ThreadPoolExecutor(args.clients) as ex:
        list(ex.map(post, queries))
    dt_con = time.perf_counter() - t0
    cells = len(queries) * args.qlen * D
    health = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=60).read())
    print(json.dumps({
        "clients": args.clients, "requests": len(queries),
        "sequential_gcups": round(cells / dt_seq / 1e9, 1),
        "concurrent_gcups": round(cells / dt_con / 1e9, 1),
        "dispatches": health.get("dispatches"),
        "requests_served": health.get("requests")}))
    srv.shutdown()


if __name__ == "__main__":
    main()
