"""Stream-mode profile-build lab: how much does the gather's transpose cost?

build_profile gathers sm[:, flat] -> [24, G, POS, 128] then transposes to
the kernel's [G, 24, POS, 128] layout.  In stream mode that happens per
chunk inside the scan; if XLA materialises the transpose, the profile
pays an extra HBM write+read (24 B/residue each way).  This lab times:

  g_major   the shipping build_profile (gather + transpose)
  a_major   gather only, [24, G, POS, 128] out
  e2e       _search_bin_stream (the real per-chunk cost inside the scan)

Run from the repo root: python scripts/profile_lab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from oswald_tpu.kernels import build_profile
from oswald_tpu.kernels.sw_lanes import SUBLANES, LANES, CHUNK_WIDTH
from oswald_tpu.submat import get_submat


def t_min(f, iters=8):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    G, W = 64, CHUNK_WIDTH
    seq = jnp.asarray(rng.integers(0, 24, (G, W, SUBLANES, LANES)),
                      jnp.int8)
    sm = get_submat("blosum62")
    sm_dev = jnp.asarray(sm)

    g_major = jax.jit(build_profile)

    @jax.jit
    def a_major(db_chunk, submat):
        s = jnp.asarray(submat, jnp.int8)
        flat = db_chunk.reshape(G, W * SUBLANES, LANES)
        return s[:, flat]                     # [24, G, POS, 128], no transpose

    # sync via a tiny host transfer (block_until_ready unreliable here)
    fg = lambda: int(jnp.sum(g_major(seq, sm_dev)[0, 0, 0, :8]))
    fa = lambda: int(jnp.sum(a_major(seq, sm_dev)[0, 0, 0, :8]))
    fg(), fa()
    tg, ta = t_min(fg), t_min(fa)
    bytes_out = G * 24 * W * SUBLANES * LANES
    print(json.dumps({
        "g_major_s": round(tg, 5), "a_major_s": round(ta, 5),
        "g_major_GBps": round(bytes_out / tg / 1e9, 1),
        "a_major_GBps": round(bytes_out / ta / 1e9, 1)}))

    # end-to-end stream scan cost per chunk at m_pad=512
    from oswald_tpu.engine.search import _search_bin_stream
    C = 8
    seqC = jnp.asarray(rng.integers(0, 24, (C, G, W, SUBLANES, LANES)),
                       jnp.int8)
    q = jnp.asarray(rng.integers(0, 23, 512), jnp.int32)
    gaps = jnp.asarray([10, 2], jnp.int32)
    f = lambda: int(jnp.sum(_search_bin_stream(
        q, gaps, sm_dev, seqC, 8, False, 2, jnp.float32, None, 16, True)))
    f()
    dt = t_min(f, 5)
    cells = 512 * C * G * W * SUBLANES * LANES
    print(json.dumps({"stream_e2e_s": round(dt, 4),
                      "stream_gcells": round(cells / dt / 1e9, 1)}))

    # same shapes through the precompute path for reference
    from oswald_tpu.engine.search import _search_bin
    prof = jnp.stack([g_major(seqC[c], sm_dev) for c in range(C)])
    fp = lambda: int(jnp.sum(_search_bin(
        q, gaps, prof, 8, False, 2, jnp.float32, None, 16, True)))
    fp()
    dtp = t_min(fp, 5)
    print(json.dumps({"precompute_e2e_s": round(dtp, 4),
                      "precompute_gcells": round(cells / dtp / 1e9, 1)}))


if __name__ == "__main__":
    main()
