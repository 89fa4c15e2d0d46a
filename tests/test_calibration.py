"""E-value calibration gate (VERDICT r4 weak item 5).

The plumbing tests (test_stats.py) prove the moments/fit machinery moves
numbers correctly; this gate asserts the numbers are TRUE: on a
realistic-composition corpus, reported E-values must match observed
chance-hit counts within a factor ~2, planted homologs must be called
significant, and shuffled versions of the same sequences must not.  A
null model mis-calibrated by more than ~2x fails here (the round-4 suite
would have passed one — measured: the pre-round-5 moment-only fit ran
2-3x anti-conservative on exactly this corpus; the count-ratio tail
recalibration, stats.tail_calibrate, is what makes this gate passable).

Reference relationship: beyond-reference (OSWALD is score-only,
/root/reference/host/src/FPGAsearch.c:306-321); the behavioral bar is
SSEARCH-style empirical statistics.
"""

import numpy as np
import pytest

from oswald_tpu.io import pack_sequences
from oswald_tpu.io.synth import (make_realistic_corpus, realistic_residues,
                                 mutate)
from oswald_tpu.engine import SearchEngine, SearchConfig


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    target = realistic_residues(rng, 220)
    hom = mutate(target, rng, identity=0.65)
    flat, lengths, titles = make_realistic_corpus(rng, 2500, max_len=700,
                                                  planted=[hom])
    db = pack_sequences(flat, lengths, titles)
    return rng, db, target


def test_decoy_evalues_match_observed_chance_counts(corpus):
    """Decoy (random-composition) queries have NO true homologs, so every
    hit is chance: across E thresholds, the number of hits reported at
    E <= t must be ~t per query.  Bounds at 2.5x absorb Poisson noise on
    ~10-60 expected counts; a >~2x mis-calibrated null fails."""
    rng, db, _ = corpus
    eng = SearchEngine(db, SearchConfig(top=40))
    nq = 6
    evs = []
    for _ in range(nq):
        q = realistic_residues(rng, 130)
        r = eng.search(q)
        assert r.evalues is not None
        evs.append(np.asarray(r.evalues))
    evs = np.stack(evs)
    for t, lo, hi in ((2.0, 1 / 2.5, 2.5), (5.0, 1 / 2.5, 2.5),
                      (10.0, 1 / 2.0, 2.0)):
        obs = int((evs <= t).sum())
        exp = t * nq
        assert lo <= obs / exp <= hi, \
            (f"E<={t}: observed {obs} chance hits vs expected {exp:.0f} "
             f"(ratio {obs / exp:.2f}) — null mis-calibrated")


def test_planted_homolog_significant_shuffled_not(corpus):
    """A ~65%-identity homolog of the query is planted in the corpus: the
    query must rank it first with E << 1.  The SAME query shuffled
    (composition preserved, homology destroyed) must get no significant
    hit — significance tracks homology, not composition."""
    rng, db, target = corpus
    eng = SearchEngine(db, SearchConfig(top=5))
    r = eng.search(target)
    assert r.titles[0].startswith("planted_")
    assert r.evalues[0] < 1e-10
    # the remaining hits are chance: sane E magnitudes
    assert r.evalues[1] > 1e-3
    shuf = np.asarray(target).copy()
    rng.shuffle(shuf)
    r2 = eng.search(shuf)
    assert r2.evalues[0] > 0.01
