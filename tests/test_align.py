"""Alignment traceback: score parity with the oracle + alignment validity.

The traceback (engine/align.py) must (1) reproduce the exact SW score the
scoring oracle computes, and (2) emit an alignment whose score, recomputed
directly from the aligned strings, equals that score — a self-consistency
check that fails on any wrong traceback pointer.
"""

import numpy as np
import pytest

from oswald_tpu.alphabet import encode, DUMMY
from oswald_tpu.core import sw_score_numpy
from oswald_tpu.submat import get_submat
from oswald_tpu.engine.align import sw_align, sw_align_linear, \
    align_hits, format_alignment
from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig

from conftest import random_protein


def _rescore_alignment(aln, submat, og, eg):
    """Recompute the alignment score from the emitted aligned strings."""
    score = 0
    in_gap = False
    qa, sa = encode(aln.q_aln.replace("-", "*")), \
        encode(aln.s_aln.replace("-", "*"))
    gq = np.frombuffer(aln.q_aln.encode(), np.uint8) == ord("-")
    gs = np.frombuffer(aln.s_aln.encode(), np.uint8) == ord("-")
    for i in range(len(qa)):
        if gq[i] or gs[i]:
            score -= eg + (0 if in_gap else og)
            in_gap = True
        else:
            score += int(submat[qa[i], sa[i]])
            in_gap = False
    return score


@pytest.mark.parametrize("matrix,og,eg", [
    ("blosum62", 10, 2),
    ("pam30", 9, 1),     # negative-min matrix (noadj-excluded config)
    ("blosum50", 5, 5),
])
def test_traceback_score_parity_random(rng, matrix, og, eg):
    sub = get_submat(matrix)
    for _ in range(25):
        m = int(rng.integers(1, 120))
        n = int(rng.integers(1, 150))
        a, b = random_protein(rng, m), random_protein(rng, n)
        want = sw_score_numpy(a, b, sub, og, eg)
        aln = sw_align(a, b, sub, og, eg)
        assert aln.score == want
        if aln.score > 0:
            assert _rescore_alignment(aln, sub, og, eg) == aln.score
            # coordinates consistent with gap-free residue counts
            qn = sum(1 for c in aln.q_aln if c != "-")
            sn = sum(1 for c in aln.s_aln if c != "-")
            assert aln.q_end - aln.q_start + 1 == qn
            assert aln.s_end - aln.s_start + 1 == sn
            assert aln.identities <= aln.positives <= aln.length


def test_traceback_known_alignment():
    """Hand-checkable case: identical sequences align end to end."""
    sub = get_submat("blosum62")
    a = encode("MKVLATGHWCE")
    aln = sw_align(a, a, sub, 10, 2)
    assert aln.q_aln == "MKVLATGHWCE" == aln.s_aln
    assert aln.identities == 11 and aln.gaps == 0
    assert aln.score == int(sub[a, a].sum())
    assert aln.q_start == 1 and aln.q_end == 11


def test_traceback_with_gap():
    """A deletion in the subject must show as a '-' run in the s row."""
    sub = get_submat("blosum62")
    q = encode("MKVLATGHWCEDYFRNQPIS")
    s = np.concatenate([q[:8], q[12:]])          # drop 4 query residues
    aln = sw_align(q, s, sub, 10, 2)
    assert aln.score == sw_score_numpy(q, s, sub, 10, 2)
    assert "----" in aln.s_aln and "-" not in aln.q_aln
    assert aln.gaps == 4


def test_traceback_zero_score():
    sub = get_submat("blosum62")
    # a dummy-only query scores 0 against everything
    aln = sw_align(np.full(5, DUMMY, np.int8), random_protein(
        np.random.default_rng(1), 20), sub, 10, 2)
    assert aln.score == 0 and aln.length == 0
    assert "(no alignment" in format_alignment(aln)


@pytest.mark.parametrize("matrix,og,eg", [
    ("blosum62", 10, 2),
    ("pam30", 9, 1),
    ("blosum50", 5, 5),
    ("blosum62", 0, 1),           # zero open: all-gap-cost-is-extend edge
])
def test_linear_space_matches_quadratic(rng, matrix, og, eg):
    """sw_align_linear must reproduce the quadratic path's score exactly,
    and its emitted alignment must rescore to that score (optimal paths
    may differ when ties exist; scores may not)."""
    sub = get_submat(matrix)
    for _ in range(25):
        m = int(rng.integers(1, 120))
        n = int(rng.integers(1, 150))
        a, b = random_protein(rng, m), random_protein(rng, n)
        ref = sw_align(a, b, sub, og, eg)
        lin = sw_align_linear(a, b, sub, og, eg)
        assert lin.score == ref.score
        if lin.score > 0:
            assert _rescore_alignment(lin, sub, og, eg) == lin.score
            qn = sum(1 for c in lin.q_aln if c != "-")
            sn = sum(1 for c in lin.s_aln if c != "-")
            assert lin.q_end - lin.q_start + 1 == qn
            assert lin.s_end - lin.s_start + 1 == sn


def test_linear_space_gapped_and_identical():
    sub = get_submat("blosum62")
    q = encode("MKVLATGHWCEDYFRNQPIS")
    s = np.concatenate([q[:8], q[12:]])
    lin = sw_align_linear(q, s, sub, 10, 2)
    assert lin.score == sw_score_numpy(q, s, sub, 10, 2)
    assert _rescore_alignment(lin, sub, 10, 2) == lin.score
    assert lin.gaps == 4
    ident = sw_align_linear(q, q, sub, 10, 2)
    assert ident.q_aln == "MKVLATGHWCEDYFRNQPIS" == ident.s_aln
    assert ident.score == int(sub[q, q].sum())
    # zero-score input returns the empty alignment, like sw_align
    z = sw_align_linear(np.full(5, DUMMY, np.int8),
                        encode("MKVLA"), sub, 10, 2)
    assert z.score == 0 and z.length == 0


def test_max_cells_dispatches_to_linear_space(rng):
    """An over-the-guard problem no longer raises: sw_align transparently
    answers through the O(m+n)-memory path."""
    sub = get_submat("blosum62")
    a, b = random_protein(rng, 300), random_protein(rng, 400)
    ref = sw_align(a, b, sub, 10, 2)                  # quadratic
    lin = sw_align(a, b, sub, 10, 2, max_cells=1000)  # forced linear
    assert lin.score == ref.score
    assert _rescore_alignment(lin, sub, 10, 2) == lin.score


def test_align_hits_match_engine_scores(rng):
    """End to end: engine top-k scores == traceback scores for every hit,
    through sequence recovery from the packed (and saved/loaded) DB."""
    lengths = rng.integers(10, 200, size=400)
    seqs = [random_protein(rng, int(l)) for l in lengths]
    db = pack_sequences(np.concatenate(seqs), lengths,
                        [f"t{i}" for i in range(400)])
    cfg = SearchConfig(top=8)
    eng = SearchEngine(db, cfg)
    q = random_protein(rng, 64)
    res = eng.search(q)
    sub = get_submat(cfg.matrix)
    alns = align_hits(db, q, res, sub, cfg.open_gap, cfg.extend_gap)
    assert len(alns) == len(res.scores)
    for aln, score in zip(alns, res.scores):
        assert aln.score == int(score)
    # formatted block renders without error and mentions identities
    txt = format_alignment(alns[0])
    assert "Identities:" in txt and "Query" in txt


def test_sequence_of_roundtrip(rng):
    lengths = rng.integers(1, 300, size=1500)
    seqs = [random_protein(rng, int(l)) for l in lengths]
    db = pack_sequences(np.concatenate(seqs), lengths,
                        [f"t{i}" for i in range(1500)])
    order = np.argsort(lengths, kind="stable")
    for sid in [0, 1, 777, 1023, 1024, 1499]:
        got = db.sequence_of(sid)
        np.testing.assert_array_equal(got, seqs[order[sid]])
    with pytest.raises(IndexError):
        db.sequence_of(1500)
