"""Hardware correctness certification: compiled kernel vs independent oracle.

CI runs every kernel in Pallas interpret mode on CPU (tests/conftest.py);
this module closes the remaining gap by checking exact score parity of the
REAL Mosaic-compiled kernel against the anti-diagonal oracle on whatever
backend is attached.  bench.py runs it as an asserting pre-stage so every
recorded benchmark number doubles as a correctness certificate — a silent
miscompile fails the bench (rc != 0) instead of shipping a fast wrong
answer.  The reference's device-kernel semantics
(/root/reference/device/sw.cl:44-86) are the contract being certified.

Coverage: >= 2 matrices including a negative-min config (pam30 7/1), a
titin-length (5478) query, multi-chunk bins with 64-wide tails, and the
packed-segment (q_segs) batched path.
"""

import time

import numpy as np

from oswald_tpu.alphabet import DUMMY


def _oracle_layout(seqs, lengths):
    """Length-ascending padded [n, nmax] matrix + lengths, matching the
    packed db's sorted order."""
    n = len(seqs)
    order = np.argsort(lengths, kind="stable")
    nmax = int(lengths.max())
    bs = np.full((n, nmax), DUMMY, np.int32)
    for i, src in enumerate(order):
        bs[i, : lengths[src]] = seqs[src]
    return bs, lengths[order].astype(np.int32)


def run_parity(n: int = 4096, lmax: int = 700, seed: int = 7,
               titin_sample: int = 256, log=None) -> dict:
    """Run the full parity suite; returns {"parity": "ok"|"FAIL", ...}.

    The engines under test run on the default backend (the compiled kernel
    on TPU); the oracle runs on host CPU jax.  Exactness is exact int
    equality — any mismatch is reported with its first failing slots.
    """
    import jax
    from oswald_tpu.core import sw_score_diag_batch
    from oswald_tpu.io import pack_sequences
    from oswald_tpu.engine import SearchEngine, SearchConfig
    from oswald_tpu.submat import get_submat

    def say(msg):
        if log:
            log(msg)

    t_start = time.perf_counter()
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, lmax, size=n)
    seqs = [rng.integers(0, 23, int(l)).astype(np.int8) for l in lengths]
    db = pack_sequences(np.concatenate(seqs), lengths,
                        [f"s{i}" for i in range(n)])
    bs, ns = _oracle_layout(seqs, lengths)
    checks = 0
    failures = []

    for matrix, og, eg in (("blosum62", 10, 2), ("pam30", 7, 1)):
        eng = SearchEngine(db, SearchConfig(matrix=matrix, open_gap=og,
                                            extend_gap=eg))
        sm = get_submat(matrix)
        # 64/512: exact pad multiples (branch-free kernel variant); 65:
        # one row past the quantum — certifies the dummy-row-block SKIP
        # program on hardware (15 of 16 row blocks in its pad class are
        # padding); 5478: titin-scale, multi-row-block carry + skip
        for qlen in (64, 65, 512, 5478):
            q = rng.integers(0, 23, size=qlen).astype(np.int8)
            t0 = time.perf_counter()
            got = np.asarray(eng.score_all(q))[np.asarray(eng.valid)]
            t1 = time.perf_counter()
            # titin-length diagonal scans are too slow for the full db —
            # verify a random sample against the host-CPU oracle (the
            # engine under test scores the full db on TPU either way)
            if qlen > 2048:
                sample = rng.choice(n, size=titin_sample, replace=False)
            else:
                sample = np.arange(n)
            with jax.default_device(jax.devices("cpu")[0]):
                want = np.asarray(sw_score_diag_batch(
                    q.astype(np.int32), bs[sample], ns[sample], sm, og, eg))
            got_cmp = got[sample]
            ok = np.array_equal(got_cmp, want)
            checks += 1
            say(f"parity {matrix} {og}/{eg} qlen {qlen}: "
                f"{'EXACT' if ok else 'MISMATCH'} over {len(sample)} seqs "
                f"(engine {t1 - t0:.2f}s, oracle "
                f"{time.perf_counter() - t1:.2f}s)")
            if not ok:
                bad = np.flatnonzero(got_cmp != want)[:5]
                failures.append(
                    {"check": f"{matrix}:{qlen}", "slots": bad.tolist(),
                     "got": got_cmp[bad].tolist(),
                     "want": want[bad].tolist()})

        # packed-segment (q_segs) batched path: a mixed batch of short
        # queries through search_many must equal per-query search results
        # (which the score_all checks above certify against the oracle)
        qs = [rng.integers(0, 23, size=int(l)).astype(np.int8)
              for l in (40, 64, 55, 128, 100, 61, 200, 90)]
        n_fail = len(failures)
        batched = eng.search_many(qs, batch=True)
        singles = [eng.search(q) for q in qs]
        for b, s in zip(batched, singles):
            ok = (np.array_equal(b.scores, s.scores) and
                  np.array_equal(b.seq_ids, s.seq_ids))
            checks += 1
            if not ok:
                failures.append(
                    {"check": f"{matrix}:packed",
                     "got": b.scores.tolist(), "want": s.scores.tolist()})
        say(f"parity {matrix} packed batch ({len(qs)} mixed short "
            f"queries): {'EXACT' if len(failures) == n_fail else 'MISMATCH'}")
        del eng

    out = {"parity": "ok" if not failures else "FAIL",
           "checks": checks,
           "backend": jax.default_backend(),
           "seconds": round(time.perf_counter() - t_start, 1)}
    if failures:
        out["failures"] = failures
    return out
