"""Device auto-tuner for the kernel geometry (`oswald-tpu tune`).

The shipping defaults (u_rows=8, group_block=2, col_unroll=32) are the
measured optimum on TPU v5e (SCALING.md's kernel-lab ledger); other TPU
generations have different VPU issue rates and VMEM budgets, so a
deployment on new hardware runs `oswald-tpu tune` once and passes the
winning flags to `search`/`serve`.

The measurement drives the REAL kernel (`engine.search._search_bin` — the
same compiled scan the engine dispatches) over a synthetic profile stack,
so it needs no database and finishes in a few minutes even through a
remote compile service.  Tuning is coordinate descent over the three
geometry axes from the current default, which matches how the optimum was
found by hand; every candidate's score checksum must equal the default's
(a miscompiled candidate disqualifies itself rather than winning).

Reference analog: OSWALD's compile-time geometry knobs
(FPGA_VECTOR_LENGTH, FPGA_BLOCK_WIDTH, CPU_BLOCK_SIZE —
/root/reference/host/src/arguments.h:24-28), which its papers tuned per
board; here the tune is a runtime measurement instead of a rebuild.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from oswald_tpu.io.db import SUBLANES, LANES
from oswald_tpu.kernels import build_profile, CHUNK_WIDTH
from oswald_tpu.submat import get_submat

# coordinate-descent axes (validated values only: u_rows pow2 <= 64,
# group_block must divide the synthetic G, col_unroll divides 64)
U_ROWS_AXIS = (4, 8, 16)
GROUP_BLOCK_AXIS = (1, 2, 3, 4)
COL_UNROLL_AXIS = (8, 16, 32)
SYNTH_G = 24                    # divisible by every group_block candidate


def _measure(q, gaps, prof, u, gb, cu, iters):
    """(gcells_per_s, checksum) for one geometry on the attached device."""
    from oswald_tpu.engine.search import _search_bin
    interpret = jax.default_backend() != "tpu"

    def run():
        # host-transfer sum: the only reliable sync through remote tunnels
        return int(jnp.sum(_search_bin(
            q, gaps, prof, u, interpret, gb, jnp.float32, None, cu, True)))

    checksum = run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    m = q.shape[0]
    C, G = prof.shape[0], prof.shape[1]
    cells = m * G * C * CHUNK_WIDTH * SUBLANES * LANES
    return cells / min(times) / 1e9, checksum


def autotune(m: int = 512, groups: int = SYNTH_G, chunks: int = 8,
             iters: int = 3, log=None) -> dict:
    """Coordinate-descent tune; returns {"u_rows", "group_block",
    "col_unroll", "gcells", "results": [...]} (results = every candidate
    measured, for the record)."""
    def say(msg):
        if log:
            log(msg)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 23, m), jnp.int32)
    gaps = jnp.asarray([10, 2], jnp.int32)
    sm = get_submat("blosum62")
    seq = rng.integers(0, 24, (groups, chunks, CHUNK_WIDTH, SUBLANES,
                               LANES)).astype(np.int8)
    prof = jnp.stack([build_profile(jnp.asarray(seq[:, c]), sm)
                      for c in range(chunks)])

    # baseline = the shipping geometry where the axes include it, else the
    # first entry of each (possibly monkeypatched/narrowed) axis — the
    # baseline must be a config the descent actually measures
    best = {"u_rows": 8 if 8 in U_ROWS_AXIS else U_ROWS_AXIS[0],
            "group_block": 2 if 2 in GROUP_BLOCK_AXIS
            else GROUP_BLOCK_AXIS[0],
            "col_unroll": 32 if 32 in COL_UNROLL_AXIS
            else COL_UNROLL_AXIS[0]}
    results = []
    ref_sum = None

    def try_cfg(u, gb, cu):
        nonlocal ref_sum
        if m % u or groups % gb or 32 % cu:
            return None
        key = (u, gb, cu)
        for r in results:                     # don't re-measure
            if r["cfg"] == key:
                return r["gcells"]
        try:
            gc, s = _measure(q, gaps, prof, u, gb, cu, iters)
        except Exception as e:                # noqa: BLE001 — a candidate
            say(f"  u={u} gb={gb} cu={cu}: FAILED ({type(e).__name__})")
            results.append({"cfg": key, "gcells": 0.0, "error": str(e)[:80]})
            return 0.0                        # that can't compile loses
        if ref_sum is None:
            ref_sum = s
        if s != ref_sum:                      # exactness gate
            say(f"  u={u} gb={gb} cu={cu}: CHECKSUM MISMATCH — disqualified")
            results.append({"cfg": key, "gcells": 0.0, "error": "checksum"})
            return 0.0
        say(f"  u={u} gb={gb} cu={cu}: {gc:.1f} Gcells/s")
        results.append({"cfg": key, "gcells": round(gc, 3)})
        return gc

    if m % best["u_rows"] or groups % best["group_block"]:
        raise ValueError(
            f"m={m} must be a multiple of u_rows {best['u_rows']} and "
            f"groups={groups} of group_block {best['group_block']} (the "
            "baseline geometry must be measurable)")
    say(f"tuning on {jax.devices()[0].device_kind} "
        f"(m={m}, G={groups}, C={chunks})")
    best_gc = try_cfg(best["u_rows"], best["group_block"],
                      best["col_unroll"]) or 0.0
    for axis, values in (("u_rows", U_ROWS_AXIS),
                         ("group_block", GROUP_BLOCK_AXIS),
                         ("col_unroll", COL_UNROLL_AXIS)):
        for v in values:
            if v == best[axis]:
                continue
            cand = dict(best, **{axis: v})
            gc = try_cfg(cand["u_rows"], cand["group_block"],
                         cand["col_unroll"])
            if gc is not None and gc > best_gc:
                best, best_gc = cand, gc
    if not any("error" not in r for r in results):
        raise RuntimeError(
            "no tuning candidate ran successfully; see the per-candidate "
            "errors in the log")
    return {**best, "gcells": round(best_gc, 3),
            "device": jax.devices()[0].device_kind,
            "results": [{"u_rows": c[0], "group_block": c[1],
                         "col_unroll": c[2],
                         **{k: v for k, v in r.items() if k != "cfg"}}
                        for r in results for c in [r["cfg"]]]}
