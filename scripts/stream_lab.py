"""Streaming-preprocess throughput lab: a memory-capped multi-GiB build.

Generates a realistic-composition FASTA of the requested size on disk,
then runs the out-of-core preprocess (io/stream.py) with a hard staging
RAM budget so the spill path is exercised at scale, and reports end-to-end
MB/s.  The reference's preprocess (sequences.c:4-220) loads everything in
RAM; this path is the bounded-memory redesign.

Usage: python scripts/stream_lab.py [--gib 4] [--ram-budget-gib 1]
"""

import os
import sys

# repo-root import shim (PYTHONPATH must keep /root/.axon_site first
# for the TPU plugin, so scripts self-shim instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

import numpy as np

from oswald_tpu.alphabet import ALPHABET
from oswald_tpu.io.synth import realistic_lengths, residue_distribution


def generate_fasta(path: str, target_bytes: int, rng, chunk_records=200_000):
    """Realistic-composition FASTA of ~target_bytes, written in record
    chunks with vectorised byte assembly (no per-residue Python)."""
    codes, probs = residue_distribution()
    letters = np.frombuffer(ALPHABET.encode(), np.uint8)
    written = 0
    rec = 0
    nl = ord("\n")
    gt = ord(">")
    with open(path, "wb", buffering=1 << 22) as fh:
        while written < target_bytes:
            lengths = realistic_lengths(rng, chunk_records,
                                        include_titin=(rec == 0))
            total = int(lengths.sum())
            res = letters[rng.choice(codes, size=total, p=probs)]
            # assemble ">title\n<seq>\n" per record into one byte buffer
            titles = [f">r{rec + i}\n".encode()
                      for i in range(chunk_records)]
            tlen = np.fromiter((len(t) for t in titles), np.int64,
                               chunk_records)
            out_len = int(tlen.sum()) + total + chunk_records
            buf = np.empty(out_len, np.uint8)
            pos = 0
            off = 0
            for i in range(chunk_records):
                t = titles[i]
                buf[pos:pos + len(t)] = np.frombuffer(t, np.uint8)
                pos += len(t)
                L = int(lengths[i])
                buf[pos:pos + L] = res[off:off + L]
                off += L
                pos += L
                buf[pos] = nl
                pos += 1
            fh.write(memoryview(buf[:pos]))
            written += pos
            rec += chunk_records
    return written, rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gib", type=float, default=4.0)
    p.add_argument("--ram-budget-gib", type=float, default=1.0)
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        fasta = os.path.join(td, "big.fasta")
        t0 = time.perf_counter()
        nbytes, nrec = generate_fasta(fasta, int(args.gib * (1 << 30)), rng)
        gen_s = time.perf_counter() - t0
        print(f"generated {nbytes / 2**30:.2f} GiB, {nrec} records in "
              f"{gen_s:.0f}s", file=sys.stderr)

        from oswald_tpu.io.stream import preprocess_db_streaming
        budget = int(args.ram_budget_gib * (1 << 30))
        t0 = time.perf_counter()
        db = preprocess_db_streaming(fasta, os.path.join(td, "big"),
                                     ram_budget_bytes=budget)
        dt = time.perf_counter() - t0
        out = {
            "fasta_gib": round(nbytes / 2**30, 2),
            "records": db.n_seqs,
            "residues": db.n_residues,
            "ram_budget_gib": args.ram_budget_gib,
            "preprocess_s": round(dt, 1),
            "mb_per_s": round(nbytes / 2**20 / dt, 1),
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
