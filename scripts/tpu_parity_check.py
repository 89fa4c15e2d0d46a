"""Hardware parity check: the compiled Pallas engine vs the independent
anti-diagonal oracle, both running on the attached TPU.

CI runs everything in Pallas interpret mode on CPU; this script closes the
remaining gap by checking exact score parity of the REAL compiled kernel on
real hardware, including the titin-length query. Run: python
scripts/tpu_parity_check.py
"""

import sys
import time

import numpy as np

from oswald_tpu.core import sw_score_diag_batch
from oswald_tpu.io import pack_sequences
from oswald_tpu.alphabet import DUMMY
from oswald_tpu.engine import SearchEngine, SearchConfig


def main():
    import jax
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    n = 4096
    lengths = rng.integers(1, 700, size=n)
    seqs = [rng.integers(0, 23, int(l)).astype(np.int8) for l in lengths]
    db = pack_sequences(np.concatenate(seqs), lengths,
                        [f"s{i}" for i in range(n)])
    order = np.argsort(lengths, kind="stable")
    nmax = int(lengths.max())
    bs = np.full((n, nmax), DUMMY, np.int32)
    for i, src in enumerate(order):
        bs[i, : lengths[src]] = seqs[src]
    ns = lengths[order].astype(np.int32)

    for matrix, og, eg in (("blosum62", 10, 2), ("pam30", 7, 1)):
        eng = SearchEngine(db, SearchConfig(matrix=matrix, open_gap=og,
                                            extend_gap=eg))
        from oswald_tpu.submat import get_submat
        sm = get_submat(matrix)
        for qlen in (64, 512, 5478):
            q = rng.integers(0, 23, size=qlen).astype(np.int8)
            t0 = time.perf_counter()
            got = np.asarray(eng.score_all(q))[np.asarray(eng.valid)]
            t1 = time.perf_counter()
            # titin-length diagonal scans crash the remote worker — verify
            # a 256-sequence sample against the host-CPU oracle instead
            # (the engine under test stays on TPU either way)
            if qlen > 2048:
                sample = rng.choice(n, size=256, replace=False)
                with jax.default_device(jax.devices("cpu")[0]):
                    want = np.asarray(sw_score_diag_batch(
                        q.astype(np.int32), bs[sample], ns[sample],
                        sm, og, eg))
                got_cmp = got[sample]
                n_cmp = len(sample)
            else:
                want = np.asarray(sw_score_diag_batch(
                    q.astype(np.int32), bs, ns, sm, og, eg))
                got_cmp = got
                n_cmp = n
            t2 = time.perf_counter()
            ok = np.array_equal(got_cmp, want)
            print(f"{matrix} gaps {og}/{eg} qlen {qlen}: "
                  f"{'EXACT MATCH' if ok else 'MISMATCH'} over {n_cmp} seqs "
                  f"(engine {t1-t0:.2f}s, oracle {t2-t1:.2f}s)")
            if not ok:
                bad = np.flatnonzero(got_cmp != want)[:5]
                print("  first mismatches at", bad,
                      got_cmp[bad], want[bad])
                return 1
    print("ALL PARITY CHECKS PASSED on", jax.default_backend())
    return 0


if __name__ == "__main__":
    sys.exit(main())
