"""Micro-benchmark of the Pallas SW kernel on the attached device.

Times `_search_bin` on synthetic profiles and reports device GCUPS over the
*padded* cell count (kernel throughput, independent of packing efficiency).
Usage: python scripts/kernel_bench.py [--m 512] [--groups 8] [--L 1024]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from oswald_tpu.kernels import sw_chunk, build_profile
from oswald_tpu.engine.search import _search_bin
from oswald_tpu.submat import get_submat
from oswald_tpu.io.db import SUBLANES, LANES


def run(m, G, L, W, u_rows, prof_dtype, gb=1, acc=jnp.int32, iters=5):
    rng = np.random.default_rng(0)
    C = L // W
    q = jnp.asarray(rng.integers(0, 23, m), jnp.int32)
    gaps = jnp.asarray([10, 2], jnp.int32)
    sm = get_submat("blosum62").astype(prof_dtype)
    seq = rng.integers(0, 23, (G, C, W, SUBLANES, LANES)).astype(np.int8)
    prof = jnp.stack([build_profile(jnp.asarray(seq[:, c]), sm)
                      for c in range(C)])
    prof = prof.astype(prof_dtype)

    # NOTE: under the axon tunnel block_until_ready returns early; a host
    # transfer is the only reliable sync.
    f = lambda: int(jnp.sum(_search_bin(q, gaps, prof, u_rows, False, gb,
                                        acc)))
    f()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    cells = m * G * L * SUBLANES * LANES
    return cells / dt / 1e9, dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--groups", type=int, default=8)
    p.add_argument("--L", type=int, default=1024)
    args = p.parse_args()

    import jax.numpy as jnp
    cases = [(4, 4, jnp.int32), (4, 4, jnp.float32), (2, 4, jnp.int32),
             (2, 6, jnp.int32), (2, 8, jnp.int32), (4, 6, jnp.int32),
             (6, 2, jnp.int32), (6, 4, jnp.int32), (8, 2, jnp.float32),
             (2, 8, jnp.float32), (4, 6, jnp.float32), (8, 4, jnp.float32)]
    for (u, gb, acc) in cases:
        try:
            g, dt = run(args.m, args.groups, args.L, 128, u, "int8", gb, acc)
            print(f"U={u:2d} GB={gb} acc={acc.__name__:8s}: {g:8.1f} GCUPS "
                  f"({dt*1e3:.2f} ms)")
        except Exception as e:
            print(f"U={u:2d} GB={gb} acc={acc.__name__:8s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}")
