"""Kernel experiment lab: candidate inner-loop restructures of the Pallas
SW kernel, benchmarked head-to-head on the attached device.

Experiment-only — winners get implemented cleanly in
oswald_tpu/kernels/sw_lanes.py and validated by the parity tests.

Variants (all algebraically exact rewrites of the same recurrence):
  base   the shipping kernel (serial per-row chain inside each column)
  fscan  parallel cur' for all U rows, then a 2-op/step serial F scan,
         then parallel E/H/smax updates — shortens the critical path from
         ~4 ops/row to 2 ops/row per column
  ks     like fscan but the F scan is a Kogge-Stone log2(U)-depth
         prefix-max (bias by u*eg so the max-plus scan becomes a pure
         running max) — critical path ~log2(U) steps, ~2 extra ops/cell

The algebra for fscan/ks: with cur'[u] = max(diag[u] + s[u], 0, e[u]) and
c[u] = cur'[u] - oeg,

  f[u]   = max(f[u-1] - eg, cand[u-1])  where cand = cur - oeg
  cur[u] = max(cur'[u], f[u])

and since eg <= oeg:  max(f-eg, max(cur',f)-oeg) = max(f-eg, cur'-oeg),
so the F chain depends only on the parallel-computable c[u], not on cur.
Bias a[u] = f[u] + u*eg turns the chain into a running max of
{f_in, c[u-1] + u*eg}, which Kogge-Stone computes in log2 depth.

Usage: python scripts/kernel_lab.py [--variants base,fscan,ks] [--check]
"""

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oswald_tpu.alphabet import ALPHA_SIZE
from oswald_tpu.io.db import SUBLANES, LANES
from oswald_tpu.kernels import build_profile, sw_chunk
from oswald_tpu.submat import get_submat

CHUNK_WIDTH = 128


def _kernel_lab(u_rows, gb, acc_dtype, col_unroll, variant, q_ref, gaps_ref,
                prof_ref, colh_ref, colhd_ref, cole_ref, sin_ref, scores_ref,
                colho_ref, coleo_ref, hrow_ref, fcol_ref):
    r = pl.program_id(1)
    U = u_rows
    W = prof_ref.shape[2] // SUBLANES
    eg = gaps_ref[1].astype(acc_dtype)
    oeg = (gaps_ref[0] + gaps_ref[1]).astype(acc_dtype)

    @pl.when(r == 0)
    def _init():
        hrow_ref[...] = jnp.zeros_like(hrow_ref)
        fcol_ref[...] = jnp.zeros_like(fcol_ref)
        scores_ref[...] = sin_ref[...]

    i0 = r * U
    a = [q_ref[i0 + u] for u in range(U)]
    zero = jnp.zeros((SUBLANES, LANES), acc_dtype)
    e0 = tuple(tuple(cole_ref[g, u] for u in range(U)) for g in range(gb))
    hl0 = tuple(tuple(colh_ref[g, u] for u in range(U)) for g in range(gb))
    carry0 = (tuple(colhd_ref[g, 0] for g in range(gb)),
              tuple(zero for _ in range(gb)), e0, hl0)

    # bias constants for the Kogge-Stone variant (broadcast scalars)
    if variant == "ks":
        biases = [eg * u for u in range(1, U + 1)]

    def load_s(j):
        p = j * SUBLANES
        return [[prof_ref[g, a[u], pl.ds(p, SUBLANES), :]
                 .astype(acc_dtype) for u in range(U)] for g in range(gb)]

    def one_col(j, carry, s_pre=None):
        hprev, smax, e, hl = carry
        p = j * SUBLANES
        f_in = [fcol_ref[g, pl.ds(p, SUBLANES), :] for g in range(gb)]
        hrow_j = [hrow_ref[g, pl.ds(p, SUBLANES), :] for g in range(gb)]
        smax = list(smax)
        e = [list(eu) for eu in e]
        hl = [list(hu) for hu in hl]
        for g in range(gb):
            # diag[u] = H[i0+u-1, j-1]: hprev for u=0, prev column's hl after
            diag = [hprev[g]] + hl[g][:U - 1]
            s = s_pre[g] if s_pre is not None else \
                [prof_ref[g, a[u], pl.ds(p, SUBLANES), :].astype(acc_dtype)
                 for u in range(U)]
            # parallel part: F-independent candidate per row
            curp = [jnp.maximum(jnp.maximum(diag[u] + s[u], 0), e[g][u])
                    for u in range(U)]
            c = [curp[u] - oeg for u in range(U)]
            if variant != "ks":            # fscan and pre share the scan
                f = [f_in[g]]
                for u in range(1, U):
                    f.append(jnp.maximum(f[u - 1] - eg, c[u - 1]))
                f_out = jnp.maximum(f[U - 1] - eg, c[U - 1])
            else:  # ks
                vals = [f_in[g]] + [c[u - 1] + biases[u - 1]
                                    for u in range(1, U)]
                vals.append(c[U - 1] + biases[U - 1])    # for f_out
                n = U + 1
                off = 1
                while off < n:
                    vals = [vals[u] if u < off else
                            jnp.maximum(vals[u], vals[u - off])
                            for u in range(n)]
                    off *= 2
                f = [vals[0]] + [vals[u] - biases[u - 1]
                                 for u in range(1, U)]
                f_out = vals[U] - biases[U - 1]
            cur = [jnp.maximum(curp[u], f[u]) for u in range(U)]
            for u in range(U):
                if variant in ("pmax", "noadj"):
                    # smax over curp is exact: every f value is dominated
                    # by an earlier curp in the same column (f-scan only
                    # subtracts penalties from c = curp - oeg, and the
                    # initial f=0 <= any 0-clamped curp), so
                    # max over cur == max over curp
                    smax[g] = jnp.maximum(smax[g], curp[u])
                else:
                    smax[g] = jnp.maximum(smax[g], cur[u])
                if variant == "noadj":
                    # E opens from curp (reuse c), not from cur: drops
                    # gap-in-one-sequence-immediately-after-gap-in-the-
                    # other paths; exact iff min(submat) + 2*extend >= 0
                    # (then a substitution always beats adjacent opposite
                    # gaps).  Saves the cur-oeg sub — 1 of ~12 ops/cell.
                    e[g][u] = jnp.maximum(e[g][u] - eg, c[u])
                else:
                    e[g][u] = jnp.maximum(e[g][u] - eg, cur[u] - oeg)
            hprev = list(hprev)
            hprev[g] = hrow_j[g]
            hprev = tuple(hprev)
            hl[g] = cur
            hrow_ref[g, pl.ds(p, SUBLANES), :] = cur[U - 1]
            fcol_ref[g, pl.ds(p, SUBLANES), :] = f_out
        return (tuple(hprev), tuple(smax),
                tuple(tuple(eu) for eu in e),
                tuple(tuple(hu) for hu in hl))

    if variant == "pre":
        # software-pipelined profile loads: issue column k+1's s loads
        # before column k's compute chain
        def body(jj, carry):
            j0 = jj * col_unroll
            s_next = load_s(j0)
            for k in range(col_unroll):
                s_cur = s_next
                if k + 1 < col_unroll:
                    s_next = load_s(j0 + k + 1)
                carry = one_col(j0 + k, carry, s_cur)
            return carry
    else:
        def body(jj, carry):
            for k in range(col_unroll):
                carry = one_col(jj * col_unroll + k, carry)
            return carry

    _, smax, e, hl = jax.lax.fori_loop(0, W // col_unroll, body, carry0)
    for g in range(gb):
        scores_ref[g] = jnp.maximum(scores_ref[g], smax[g])
        for u in range(U):
            colho_ref[g, u] = hl[g][u]
            coleo_ref[g, u] = e[g][u]


@functools.partial(jax.jit,
                   static_argnames=("u_rows", "group_block", "acc_dtype",
                                    "interpret", "col_unroll", "variant"))
def sw_chunk_lab(q, gaps, prof_chunk, colH, colHd, colE, scores_in,
                 u_rows=8, group_block=1, acc_dtype=jnp.int32,
                 interpret=False, col_unroll=8, variant="fscan"):
    G = prof_chunk.shape[0]
    POS = prof_chunk.shape[2]
    m_pad = q.shape[0]
    R = m_pad // u_rows
    U = u_rows
    GB = group_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G // GB, R),
        in_specs=[
            pl.BlockSpec((GB, ALPHA_SIZE, POS, LANES),
                         lambda g, r, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, U, SUBLANES, LANES),
                         lambda g, r, *_: (g, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, 1, SUBLANES, LANES),
                         lambda g, r, *_: (g, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, U, SUBLANES, LANES),
                         lambda g, r, *_: (g, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, SUBLANES, LANES),
                         lambda g, r, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GB, SUBLANES, LANES),
                         lambda g, r, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, U, SUBLANES, LANES),
                         lambda g, r, *_: (g, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, U, SUBLANES, LANES),
                         lambda g, r, *_: (g, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((GB, POS, LANES), acc_dtype),
            pltpu.VMEM((GB, POS, LANES), acc_dtype),
        ],
    )
    cu = 1 if interpret else col_unroll
    kernel = functools.partial(_kernel_lab, U, GB, acc_dtype, cu, variant)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, SUBLANES, LANES), acc_dtype),
            jax.ShapeDtypeStruct((G, m_pad, SUBLANES, LANES), acc_dtype),
            jax.ShapeDtypeStruct((G, m_pad, SUBLANES, LANES), acc_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(q, jnp.int32), jnp.asarray(gaps, jnp.int32),
      prof_chunk, colH, colHd, colE, scores_in)


def _scan_bin(chunk_fn, q, gaps, prof_stack, u_rows, gb, acc, cu, **kw):
    """_search_bin_impl analog over a [C, G, 24, POS, 128] stack."""
    G = prof_stack.shape[1]
    m_pad = q.shape[0]
    colH = jnp.zeros((G, m_pad, SUBLANES, LANES), acc)
    colE = jnp.zeros_like(colH)
    scores = jnp.zeros((G, SUBLANES, LANES), acc)

    def step(carry, prof_c):
        colH, colE, scores = carry
        colHd = jnp.concatenate(
            [jnp.zeros((G, 1, SUBLANES, LANES), acc),
             colH[:, u_rows - 1::u_rows][:, :-1]], axis=1)
        scores, colH, colE = chunk_fn(q, gaps, prof_c, colH, colHd, colE,
                                      scores, u_rows=u_rows, group_block=gb,
                                      acc_dtype=acc, col_unroll=cu, **kw)
        return (colH, colE, scores), None

    (colH, colE, scores), _ = jax.lax.scan(step, (colH, colE, scores),
                                           prof_stack)
    return scores.astype(jnp.int32)


def bench(variant, m, G, L, u, gb, cu, acc=jnp.float32, iters=5, W=None):
    rng = np.random.default_rng(0)
    W = W or CHUNK_WIDTH
    C = L // W
    q = jnp.asarray(rng.integers(0, 23, m), jnp.int32)
    gaps = jnp.asarray([10, 2], jnp.int32)
    sm = get_submat("blosum62").astype("int8")
    seq = rng.integers(0, 23, (G, C, W, SUBLANES, LANES)) \
        .astype(np.int8)
    prof = jnp.stack([build_profile(jnp.asarray(seq[:, c]), sm)
                      for c in range(C)])

    chunk_fn = sw_chunk if variant == "base" else sw_chunk_lab
    kw = {} if variant == "base" else {"variant": variant}
    fn = jax.jit(lambda qq, pp: _scan_bin(chunk_fn, qq, gaps, pp, u, gb,
                                          acc, cu, interpret=False, **kw))
    sync = lambda: int(jnp.sum(fn(q, prof)))
    ref = sync()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    cells = m * G * L * SUBLANES * LANES
    return cells / dt / 1e9, dt, ref


def check_parity(variant, interpret):
    """Lab variant vs shipping kernel, random shapes, exact equality."""
    rng = np.random.default_rng(1)
    for (m, G, L, u, gb, cu) in ((64, 2, 256, 8, 2, 8), (32, 3, 128, 4, 3, 4),
                                 (24, 2, 128, 8, 1, 2)):
        C = L // CHUNK_WIDTH
        q = jnp.asarray(rng.integers(0, 23, m), jnp.int32)
        # noadj is only exact when min(submat) + 2*extend >= 0 — check it
        # at the default 10/2 (blosum62 min -4: boundary case); others at
        # an asymmetric 11/1 config
        gaps = jnp.asarray([10, 2] if variant == "noadj" else [11, 1],
                           jnp.int32)
        sm = get_submat("blosum62").astype("int8")
        seq = rng.integers(0, 23, (G, C, CHUNK_WIDTH, SUBLANES, LANES)) \
            .astype(np.int8)
        prof = jnp.stack([build_profile(jnp.asarray(seq[:, c]), sm)
                          for c in range(C)])
        want = _scan_bin(sw_chunk, q, gaps, prof, u, gb, jnp.int32, cu,
                         interpret=interpret)
        got = _scan_bin(sw_chunk_lab, q, gaps, prof, u, gb, jnp.int32, cu,
                        interpret=interpret, variant=variant)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    print(f"parity ok: {variant}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="base,fscan,ks")
    p.add_argument("--check", action="store_true")
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--groups", type=int, default=32)
    p.add_argument("--L", type=int, default=1024)
    p.add_argument("--configs", default="8:2:8",
                   help="comma list of U:GB:CU")
    p.add_argument("--W", type=int, default=None,
                   help="chunk width (default 128; 64 halves the profile "
                        "block so deeper GB fits VMEM)")
    args = p.parse_args()

    variants = args.variants.split(",")
    if args.check:
        interp = jax.default_backend() != "tpu"
        for v in variants:
            if v != "base":
                check_parity(v, interp)
        raise SystemExit(0)

    for v in variants:
        for cfg in args.configs.split(","):
            u, gb, cu = map(int, cfg.split(":"))
            try:
                g, dt, ref = bench(v, args.m, args.groups, args.L, u, gb,
                                   cu, W=args.W)
                print(f"{v:6s} W={args.W or 128} U={u} GB={gb} CU={cu:2d}: "
                      f"{g:7.1f} Gc/s "
                      f"({dt * 1e3:.2f} ms) sum={ref}", flush=True)
            except Exception as e:
                print(f"{v:6s} U={u} GB={gb} CU={cu:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
