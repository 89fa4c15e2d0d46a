"""Profile-gather lowering lab: which formulation of the 24-entry table
lookup sm[c, b] is fastest on TPU?

Variants over a [C=8, G=64, W=128, 8, 128] residue stack (amortising
dispatch/readback by scanning all chunks in one program):

  take      sm[:, flat] (the shipping gather)
  onehot    one-hot(b) @ sm.T on the MXU (bf16), cast back to int8
  onehot8   same with int8 one-hot and int8 dot (int32 accumulate)

Run from the repo root: python scripts/gather_lab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from oswald_tpu.kernels.sw_lanes import SUBLANES, LANES, CHUNK_WIDTH
from oswald_tpu.submat import get_submat


def t_min(f, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    C, G, W = 8, 64, CHUNK_WIDTH
    POS = W * SUBLANES
    seqs = jnp.asarray(rng.integers(0, 24, (C, G, W, SUBLANES, LANES)),
                       jnp.int8)
    sm = jnp.asarray(get_submat("blosum62"), jnp.int8)

    def take(seq):
        flat = seq.reshape(G, POS, LANES)
        return sm[:, flat].transpose(1, 0, 2, 3)

    def onehot(seq):
        flat = seq.reshape(G, POS, LANES)
        oh = jax.nn.one_hot(flat, 24, dtype=jnp.bfloat16)  # [G,POS,128,24]
        p = jnp.einsum("gplk,ck->gcpl", oh,
                       sm.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return p.astype(jnp.int8)

    def onehot8(seq):
        flat = seq.reshape(G, POS, LANES)
        oh = (flat[..., None] == jnp.arange(24, dtype=jnp.int8)
              ).astype(jnp.int8)                           # [G,POS,128,24]
        p = jnp.einsum("gplk,ck->gcpl", oh, sm,
                       preferred_element_type=jnp.int32)
        return p.astype(jnp.int8)

    for name, fn in (("take", take), ("onehot", onehot),
                     ("onehot8", onehot8)):
        all_fn = jax.jit(lambda s, f=fn: jax.lax.map(f, s))
        # correctness vs take
        if name != "take":
            ref = jax.jit(lambda s: jax.lax.map(take, s))(seqs)
            got = all_fn(seqs)
            ok = bool(jnp.array_equal(ref, got))
        else:
            ok = True
        sync = lambda: int(jnp.sum(all_fn(seqs)[0, 0, 0, 0, :8]))
        sync()
        dt = t_min(sync)
        out_bytes = C * G * 24 * POS * LANES
        print(json.dumps({"variant": name, "exact": ok,
                          "s": round(dt, 4),
                          "GBps": round(out_bytes / dt / 1e9, 1)}))


if __name__ == "__main__":
    main()
