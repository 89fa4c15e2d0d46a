"""Headline benchmark: single-chip GCUPS on a synthetic protein database.

Prints ONE JSON line:
  {"metric": "GCUPS", "value": N, "unit": "GCUPS", "vs_baseline": N/179}

GCUPS = query_residues x db_residues / (search_seconds x 1e9), the
reference's own metric (/root/reference/host/src/FPGAsearch.c:324), counted
over TRUE residues (padding cells are not credited).  vs_baseline compares
against the reference's best published number, 179 GCUPS for the hybrid
2x Xeon E5-2670 + Stratix V system (/root/reference/README.md:23).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

# honor an explicit JAX_PLATFORMS=cpu even when a sitecustomize imported
# jax before this process's environment was applied (e.g. JAX_PLATFORMS=cpu
# XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual-mesh
# --devices run without TPU hardware).  ONLY cpu: constraining to the
# accelerator platform (some environments export JAX_PLATFORMS=axon) would
# hide the host cpu backend the parity oracle runs on.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig


def _retry(f, tries=3):
    """Retry transient remote-compile-service failures (HTTP 500s /
    dropped responses under load) before concluding a config is broken."""
    for t in range(tries):
        try:
            return f()
        except Exception as e:        # noqa: BLE001 - transient infra
            if t == tries - 1:
                raise
            print(f"retry after {type(e).__name__}: {e}", file=sys.stderr)
            time.sleep(5)


def make_synthetic_db(n_seqs: int, mean_len: int, rng):
    """Length distribution roughly like a protein DB: lognormal, clipped."""
    lengths = np.clip(
        rng.lognormal(np.log(mean_len), 0.45, n_seqs).astype(np.int64),
        32, 4 * mean_len)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    titles = [f"synthetic_{i}" for i in range(n_seqs)]
    return pack_sequences(flat, lengths, titles)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqs", type=int, default=None)
    p.add_argument("--mean-len", type=int, default=256)
    p.add_argument("--qlen", type=int, default=512)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--matrix", default="blosum62")
    p.add_argument("--u-rows", type=int, default=8)
    p.add_argument("--suite", action="store_true",
                   help="also run the BASELINE.json config suite "
                        "(query-length sweep, multi-query batch, matrices); "
                        "results to stderr")
    p.add_argument("--devices", type=int, default=1,
                   help="mesh size: >1 uses DistributedSearchEngine for "
                        "aggregate-TCUPS / scaling-efficiency measurement "
                        "on multi-chip hosts")
    p.add_argument("--skip-parity", action="store_true",
                   help="skip the asserting hardware-parity pre-stage "
                        "(iteration only; recorded runs must include it)")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent compiled-program cache "
                        "(for measuring cold-compile costs)")
    p.add_argument("--realistic", action="store_true",
                   help="realistic-composition validation run instead of "
                        "the headline bench: SwissProt-shaped lengths + "
                        "Robinson-Robinson residue frequencies through "
                        "streaming preprocess, precompute and host_stream "
                        "searches, alignment, and E-value sanity checks "
                        "(random query => top E ~ O(1); planted homolog "
                        "=> E << 1); rows to stderr, one summary JSON "
                        "line to stdout")
    args = p.parse_args()

    if not args.no_compile_cache:
        # the persistent compile cache is part of the deployment story the
        # bench certifies: a warmed cache makes the parity gate and setup
        # reflect a restarted deployment, not a first-ever install
        from oswald_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache()

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # Asserting correctness gate: the compiled kernel (the exact binary
    # the timings below run) must match the independent oracle BEFORE any
    # number is recorded — a perf figure without it could certify a fast
    # miscompile.  Any mismatch fails the bench (rc 2).
    parity = {"parity": "skipped"}
    if not args.skip_parity:
        from oswald_tpu.utils.parity import run_parity
        # off-TPU the kernels run interpreted (already CI-covered): keep
        # the gate's runtime proportionate with a smaller database
        parity = run_parity(n=4096 if on_tpu else 128,
                            lmax=700 if on_tpu else 200,
                            titin_sample=256 if on_tpu else 4,
                            log=lambda m: print(m, file=sys.stderr))
        if parity["parity"] != "ok":
            print(json.dumps(parity), file=sys.stderr)
            print(json.dumps({"metric": "GCUPS", "value": 0.0,
                              "unit": "GCUPS", "vs_baseline": 0.0,
                              "parity": "FAIL"}))
            sys.exit(2)
    if args.realistic:
        return run_realistic(args, on_tpu, parity)

    # default TPU db ~ SwissProt scale (BASELINE.json config 2); larger DBs
    # amortise per-bin overheads and pad less (sorted groups get tighter)
    n_seqs = args.seqs if args.seqs is not None else (300_000 if on_tpu
                                                     else 2_048)
    iters = args.iters if on_tpu else 1

    rng = np.random.default_rng(0)
    db = make_synthetic_db(n_seqs, args.mean_len, rng)
    query = rng.integers(0, 23, size=args.qlen).astype(np.int8)

    cfg = SearchConfig(matrix=args.matrix, u_rows=args.u_rows)
    t0 = time.perf_counter()
    if args.devices > 1:
        from oswald_tpu.dist import DistributedSearchEngine, make_device_mesh
        eng = DistributedSearchEngine(db, cfg,
                                      mesh=make_device_mesh(args.devices))
    else:
        eng = SearchEngine(db, cfg)
    setup_s = time.perf_counter() - t0

    # warm-up: compile every bin's program (retried — the remote compile
    # service throws transient errors under load)
    _retry(lambda: eng.search(query))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        res = eng.search(query)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    cells = args.qlen * db.n_residues
    gcups_single = cells / dt / 1e9

    # Headline: sustained throughput over a pipelined query stream (the
    # reference's published numbers are likewise over query-set runs).  The
    # batch amortises the per-search host sync (a ~28 ms round trip through
    # the remote-TPU tunnel that a production server would pipeline away).
    nq = 10 if on_tpu else 2
    queries = [rng.integers(0, 23, size=args.qlen).astype(np.int8)
               for _ in range(nq)]
    _retry(lambda: eng.search_many(queries))     # compile
    btimes = []
    for _ in range(max(iters // 2, 1)):
        t0 = time.perf_counter()
        eng.search_many(queries)
        btimes.append(time.perf_counter() - t0)
    bdt = min(btimes)
    gcups = nq * args.qlen * db.n_residues / bdt / 1e9
    padded = sum(db.bins[L]["seq"].shape[0] * L * 1024
                 for L in db.bin_lengths)
    info = {
        "backend": backend, "n_seqs": db.n_seqs,
        "db_residues": db.n_residues, "qlen": args.qlen,
        "pad_overhead": round(padded / db.n_residues, 3),
        "single_query_gcups": round(gcups_single, 2),
        "single_query_s": round(dt, 4),
        "batch_n": nq, "batch_s": round(bdt, 4),
        "setup_s": round(setup_s, 2),
        "top1": int(res.scores[0]),
    }
    print(json.dumps(info), file=sys.stderr)

    if args.suite:
        run_suite(db, eng, rng, on_tpu, file=sys.stderr,
                  single_s=dt, qlen=args.qlen, batch_s=bdt, batch_n=nq)

    # the parity certificate rides the recorded tail next to the number it
    # certifies (VERDICT r2 item 1)
    print(json.dumps(parity), file=sys.stderr)
    print(json.dumps({"metric": "GCUPS", "value": round(gcups, 2),
                      "unit": "GCUPS",
                      "vs_baseline": round(gcups / 179.0, 3),
                      "parity": parity["parity"]}))


def run_realistic(args, on_tpu, parity):
    """Realistic-composition validation (VERDICT r3 item 3): everything
    the uniform-random headline never exercises — length spikes, fragment
    tails, biased residue composition, the streaming preprocess at
    corpus scale, and the significance fit against data whose scores are
    composition-dependent.  Matches the reference's Environmental NR
    benchmark conditions (/root/reference/README.md:23) as closely as an
    offline rig allows."""
    import tempfile
    from oswald_tpu.io.synth import (make_realistic_corpus, mutate,
                                     realistic_residues)
    from oswald_tpu.io.stream import preprocess_db_streaming
    from oswald_tpu.io.synth import write_fasta
    from oswald_tpu.io.db import load_db

    err = sys.stderr
    rng = np.random.default_rng(7)
    n_seqs = args.seqs if args.seqs is not None else (300_000 if on_tpu
                                                     else 2_048)
    # the planted true positives: homologs of query_hom at ~60% identity
    query = realistic_residues(rng, args.qlen)
    query_hom = realistic_residues(rng, 360)
    planted = [mutate(query_hom, rng, identity=0.6) for _ in range(3)]
    flat, lengths, titles = make_realistic_corpus(rng, n_seqs,
                                                  planted=planted)

    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "realistic.fasta")
        write_fasta(fasta, flat, lengths, titles)
        fa_bytes = os.path.getsize(fasta)
        t0 = time.perf_counter()
        # the out-of-core path on purpose: this is the most-used entry
        # point of the reference (sequences.c:4-220) and the corpus is
        # big enough to be a meaningful GB/s row
        preprocess_db_streaming(fasta, os.path.join(td, "rdb"))
        prep_s = time.perf_counter() - t0
        db = load_db(os.path.join(td, "rdb"))
        print(json.dumps({
            "config": "realistic_preprocess", "fasta_mb":
            round(fa_bytes / 2**20, 1), "n_seqs": db.n_seqs,
            "residues": db.n_residues, "preprocess_s": round(prep_s, 2),
            "mb_per_s": round(fa_bytes / 2**20 / prep_s, 1)}), file=err)

        padded = sum(db.bins[L]["seq"].shape[0] * L * 1024
                     for L in db.bin_lengths)
        cfg = SearchConfig(matrix=args.matrix)
        eng = SearchEngine(db, cfg)

        # random query: throughput + null-model sanity (its best hits are
        # chance hits, so the smallest reported E-value should be O(1) —
        # a tiny E here would mean the fit calls noise significant)
        _retry(lambda: eng.search(query))
        t0 = time.perf_counter()
        res = eng.search(query)
        dt = time.perf_counter() - t0
        gcups = args.qlen * db.n_residues / dt / 1e9
        e_top = float(res.evalues[0]) if res.evalues is not None else None
        print(json.dumps({
            "config": "realistic_random_query", "qlen": args.qlen,
            "gcups": round(gcups, 2), "search_s": round(dt, 4),
            "pad_overhead": round(padded / db.n_residues, 3),
            "top1_score": int(res.scores[0]),
            "top1_evalue": None if e_top is None else float(f"{e_top:.3g}"),
            "null_ok": bool(e_top is None or e_top > 0.01)}), file=err)

        # sustained throughput on the realistic mix: a 10-query batch
        # (the headline's own protocol) — fragments and giants amortise
        # their per-bin dispatches inside the batched programs
        queries = [realistic_residues(rng, args.qlen) for _ in range(10)]
        _retry(lambda: eng.search_many(queries))
        t0 = time.perf_counter()
        eng.search_many(queries)
        bdt = time.perf_counter() - t0
        print(json.dumps({
            "config": "realistic_batch10", "qlen": args.qlen,
            "gcups": round(10 * args.qlen * db.n_residues / bdt / 1e9, 2),
            "batch_s": round(bdt, 4)}), file=err)

        # planted homologs: the parent query must pull its three mutated
        # copies to the top with E << 1 (the true-positive control)
        rh = eng.search(query_hom)
        hits = [t for t in rh.titles[:3]]
        e_hom = float(rh.evalues[0]) if rh.evalues is not None else None
        planted_top = sum(1 for t in hits if t.startswith("planted_"))
        print(json.dumps({
            "config": "realistic_planted_homologs",
            "top3_titles": hits,
            "planted_in_top3": planted_top,
            "top1_evalue": None if e_hom is None else float(f"{e_hom:.3g}"),
            "homolog_ok": bool(planted_top == 3 and
                               (e_hom is None or e_hom < 1e-10))}),
            file=err)

        # alignment post-pass over the top hit (exercises traceback on
        # realistic data; its score must equal the search's)
        aln = eng.align(query_hom, rh)[0]
        print(json.dumps({
            "config": "realistic_alignment",
            "aln_score": int(aln.score), "search_score": int(rh.scores[0]),
            "identities": aln.identities,
            "aln_ok": bool(int(aln.score) == int(rh.scores[0]))}), file=err)

        # larger-than-HBM path on the same corpus
        import gc
        eng.prof_flat = None
        eng.tail_flats = {}
        gc.collect()
        hs = SearchEngine(db, SearchConfig(matrix=args.matrix,
                                           profile_mode="host_stream"))
        _retry(lambda: hs.search(query))
        t0 = time.perf_counter()
        hs.search(query)
        dt_hs = time.perf_counter() - t0
        print(json.dumps({
            "config": "realistic_host_stream",
            "gcups": round(args.qlen * db.n_residues / dt_hs / 1e9, 2),
            "search_s": round(dt_hs, 4)}), file=err)

        ok = (res.scores[0] >= 0 and planted_top == 3 and
              int(aln.score) == int(rh.scores[0]))
        print(json.dumps(parity), file=err)
        print(json.dumps({
            "metric": "GCUPS_realistic", "value": round(gcups, 2),
            "unit": "GCUPS", "vs_baseline": round(gcups / 179.0, 3),
            "parity": parity["parity"],
            "checks_ok": bool(ok)}))
        return 0 if ok else 3


def run_suite(db, eng, rng, on_tpu, file, single_s=None, qlen=512,
              batch_s=0.0, batch_n=0):
    """BASELINE.json configs 3 and 4: query-length sweep and multi-query
    batch; plus a matrix sweep (compiled programs are matrix-independent,
    so this mostly measures profile rebuild)."""
    from oswald_tpu.engine import SearchEngine, SearchConfig

    # config 3: query-length sweep (titin-like 5478 included on TPU).
    # NB: the loop variable must NOT be named qlen — it would shadow the
    # parameter the dist/scaling-model section below calibrates against
    # (a shadowing bug here once ran that section at 5478 vs a 512 base)
    for ql in ([64, 512, 2048, 5478] if on_tpu else [64]):
        q = rng.integers(0, 23, size=ql).astype(np.int8)
        _retry(lambda: eng.search(q))      # compile
        t0 = time.perf_counter()
        eng.search(q)
        dt = time.perf_counter() - t0
        print(json.dumps({"config": "qlen_sweep", "qlen": ql,
                          "gcups": round(ql * db.n_residues / dt / 1e9, 2),
                          "search_s": round(dt, 4)}), file=file)

    # pipelined single-query stream at qlen 64: the latency-hiding mode
    # for sequential short-query clients (dispatch i+1 before reading i;
    # engine.search_stream) vs the same queries searched serially
    nq64 = 8 if on_tpu else 2
    qs64 = [rng.integers(0, 23, size=64).astype(np.int8)
            for _ in range(nq64)]
    _retry(lambda: eng.search_stream(qs64))    # compile
    t0 = time.perf_counter()
    eng.search_stream(qs64)
    dt_p = time.perf_counter() - t0
    t0 = time.perf_counter()
    for q in qs64:
        eng.search(q)
    dt_s = time.perf_counter() - t0
    print(json.dumps({
        "config": "qlen64_pipelined_stream", "n_queries": nq64,
        "gcups": round(nq64 * 64 * db.n_residues / dt_p / 1e9, 2),
        "serial_gcups": round(nq64 * 64 * db.n_residues / dt_s / 1e9, 2),
        "search_s": round(dt_p, 4)}), file=file)

    # config 4: 20-query mixed-length batch, packed (seg_map) vs unpacked
    # (the cross-length packing win, VERDICT r2 items 3-4)
    nq = 20 if on_tpu else 3
    queries = [rng.integers(0, 23, size=int(l)).astype(np.int8)
               for l in rng.integers(100, 400, size=nq)]
    _retry(lambda: eng.search_many(queries))   # compile
    t0 = time.perf_counter()
    eng.search_many(queries)
    dt = time.perf_counter() - t0
    Q = sum(len(q) for q in queries)
    pack_rows = eng.config.batch_query_pack_rows
    try:
        eng.config.batch_query_pack_rows = 0     # disable packing
        _retry(lambda: eng.search_many(queries))  # compile unpacked
        t0 = time.perf_counter()
        eng.search_many(queries)
        dt_u = time.perf_counter() - t0
    finally:
        eng.config.batch_query_pack_rows = pack_rows
    print(json.dumps({"config": "multi_query", "n_queries": nq,
                      "gcups": round(Q * db.n_residues / dt / 1e9, 2),
                      "unpacked_gcups": round(Q * db.n_residues / dt_u / 1e9,
                                              2),
                      "search_s": round(dt, 4)}), file=file)

    # release the headline engine's HBM (2.1 GiB of profiles at the
    # default db) before constructing more engines — the suite otherwise
    # accumulates engines until the device allocator fragments/exhausts
    import gc
    eng.prof_flat = None
    eng.tail_flats = {}
    gc.collect()

    # stream mode: residues resident, profiles rebuilt per chunk in-scan
    # (the 24x-less-HBM middle mode)
    st = SearchEngine(db, SearchConfig(profile_mode="stream"))
    q = rng.integers(0, 23, size=512).astype(np.int8)
    _retry(lambda: st.search(q))           # compile
    t0 = time.perf_counter()
    st.search(q)
    dt = time.perf_counter() - t0
    print(json.dumps({"config": "stream_mode", "qlen": 512,
                      "gcups": round(512 * db.n_residues / dt / 1e9, 2),
                      "search_s": round(dt, 4)}), file=file)
    del st
    gc.collect()

    # beyond-reference query lengths: the reference hard-caps at 5478
    # (its FPGA channel depth, sw.cl:5); here the cap is a flag and the
    # planner budgets the configured worst case.  Certify m = 8192 and
    # 16384 end to end on hardware (exactness is CI-pinned vs the oracle
    # at m=8192/9000, tests/test_engine.py)
    if on_tpu:
        lq = SearchEngine(db, SearchConfig(max_query_len=16384))
        for ql in (8192, 16384):
            q = rng.integers(0, 23, size=ql).astype(np.int8)
            _retry(lambda: lq.search(q))
            t0 = time.perf_counter()
            r = lq.search(q)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "config": "beyond_reference_qlen", "qlen": ql,
                "gcups": round(ql * db.n_residues / dt / 1e9, 2),
                "search_s": round(dt, 4), "top1": int(r.scores[0])}),
                file=file)
        del lq
        gc.collect()

    # larger-than-HBM data path: force the planner's last-resort mode (as
    # if the packed DB exceeded device memory) and measure the streamed
    # throughput — the reference's bounded-chunk streaming analog
    # (FPGAsearch.c:180-237).  Round 5: slices coalesce across bin
    # boundaries into flat transfer buffers (engine _init_host_stream);
    # the default 256 MiB budget makes this database ONE transfer, so
    # the double-buffering A/B runs at a 16 MiB budget (multiple slices)
    # and a longer query (compute large enough to hide under)
    hs = SearchEngine(db, SearchConfig(profile_mode="host_stream"))
    q = rng.integers(0, 23, size=512).astype(np.int8)
    _retry(lambda: hs.search(q))           # compile
    t0 = time.perf_counter()
    hs.search(q)
    dt = time.perf_counter() - t0
    print(json.dumps({"config": "host_stream", "qlen": 512,
                      "slices": len(hs._hs_slices),
                      "gcups": round(512 * db.n_residues / dt / 1e9, 2),
                      "search_s": round(dt, 4)}), file=file)
    del hs
    gc.collect()
    q2 = rng.integers(0, 23, size=2048).astype(np.int8)
    hs2 = SearchEngine(db, SearchConfig(profile_mode="host_stream",
                                        host_stream_slice_mb=16))
    _retry(lambda: hs2.search(q2))
    t0 = time.perf_counter()
    hs2.search(q2)
    dt = time.perf_counter() - t0
    # the double-buffering proof: the same sweep with overlap disabled
    # (serial transfer -> compute -> readback per slice); overlap_ratio =
    # serial/overlapped time, >1 means the transfer hides under compute
    hs2.config.host_stream_overlap = False
    _retry(lambda: hs2.search(q2))
    t0s = time.perf_counter()
    hs2.search(q2)
    dt_serial = time.perf_counter() - t0s
    hs2.config.host_stream_overlap = True
    print(json.dumps({"config": "host_stream_overlap_ab", "qlen": 2048,
                      "slice_mb": 16, "slices": len(hs2._hs_slices),
                      "gcups": round(2048 * db.n_residues / dt / 1e9, 2),
                      "search_s": round(dt, 4),
                      "serial_s": round(dt_serial, 4),
                      "overlap_ratio": round(dt_serial / dt, 3)}),
          file=file)
    del hs2
    gc.collect()

    # distributed engine on a mesh of 1: setup must not be compile-bound
    # (the dist engine builds the same device-major flat profile array
    # with one compiled sharded gather — SCALING.md's dist-setup claim is
    # re-measured here every round) and search overhead vs the single-chip
    # engine is the shard_map + collective cost at N=1
    from oswald_tpu.dist import DistributedSearchEngine, make_device_mesh
    t0 = time.perf_counter()
    de = DistributedSearchEngine(db, SearchConfig(),
                                 mesh=make_device_mesh(1))
    d_setup = time.perf_counter() - t0
    q = rng.integers(0, 23, size=qlen).astype(np.int8)
    _retry(lambda: de.search(q))           # compile
    t0 = time.perf_counter()
    de.search(q)
    dt = time.perf_counter() - t0
    print(json.dumps({"config": "dist_mesh1", "setup_s": round(d_setup, 2),
                      "gcups": round(qlen * db.n_residues / dt / 1e9, 2),
                      "search_s": round(dt, 4)}), file=file)

    # falsifiable scaling model (VERDICT r3 item 7): per-bin collective
    # payloads + shard-padding inflation + the measured mesh=1 overhead,
    # projected to pod sizes.  The N=1 row reproduces the measured number
    # by construction; N in {8, 64, 256} are the predictions a first real
    # pod run must reproduce or refute.
    if single_s is not None:
        from oswald_tpu.dist.model import scaling_projection
        proj = scaling_projection(db, k=de.config.top, qlen=qlen,
                                  t_single_s=single_s, t_mesh1_s=dt,
                                  group_block=de.config.group_block,
                                  t_batch_s=batch_s, batch_n=batch_n)
        if dt >= single_s:
            # mesh1 slower than single-chip (the normal case): the model
            # must reproduce the measured N=1 number exactly.  The other
            # ordering is measurement noise (overhead clamps to 0 and the
            # model predicts single_s, the honest floor).
            assert abs(proj.t_proj_s[1] - dt) < 1e-6, \
                "model must reproduce N=1"
        print(json.dumps({
            "config": "scaling_model", "dispatches": proj.dispatches,
            "n_bins": proj.n_bins,
            "mesh1_overhead_s": round(proj.overhead_s, 4),
            "ag_bytes_per_dev_n8": proj.ag_bytes_per_dev.get(8),
            "projections": proj.rows()}), file=file)
    del de
    gc.collect()

    # matrices: engine setup (profile gather) + one search per matrix
    for m in (("pam30", "blosum90") if on_tpu else ("pam30",)):
        t0 = time.perf_counter()
        e2 = SearchEngine(db, SearchConfig(matrix=m))
        setup = time.perf_counter() - t0
        q = rng.integers(0, 23, size=256).astype(np.int8)
        _retry(lambda: e2.search(q))
        t0 = time.perf_counter()
        e2.search(q)
        dt = time.perf_counter() - t0
        print(json.dumps({"config": "matrix", "matrix": m,
                          "setup_s": round(setup, 2),
                          "gcups": round(256 * db.n_residues / dt / 1e9, 2)}),
              file=file)
        del e2
        gc.collect()


if __name__ == "__main__":
    sys.exit(main())
