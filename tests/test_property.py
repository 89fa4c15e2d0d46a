"""Property-based parity: random sequences, matrices, and gap configs vs
the scalar numpy oracle."""

import numpy as np
from hypothesis import given, settings, strategies as st

from oswald_tpu.submat import get_submat, MATRIX_NAMES
from oswald_tpu.core import sw_score_numpy, sw_score_diag
from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig

seq = st.lists(st.integers(0, 22), min_size=1, max_size=60)


@settings(max_examples=25, deadline=None)
@given(a=seq, b=seq,
       matrix=st.sampled_from(MATRIX_NAMES),
       og=st.integers(0, 20), eg=st.integers(0, 5))
def test_diag_oracle_matches_numpy(a, b, matrix, og, eg):
    a = np.asarray(a, np.int8)
    b = np.asarray(b, np.int8)
    sm = get_submat(matrix)
    want = sw_score_numpy(a, b, sm, og, eg)
    got = int(sw_score_diag(a, b, len(b), sm, og, eg))
    assert got == want


@settings(max_examples=15, deadline=None)
@given(data=st.data())
def test_engine_matches_numpy_random_db(data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n = data.draw(st.integers(2, 40))
    og = data.draw(st.integers(1, 15))
    eg = data.draw(st.integers(1, 4))
    matrix = data.draw(st.sampled_from(MATRIX_NAMES))
    lengths = rng.integers(1, 70, size=n)
    seqs = [rng.integers(0, 23, int(l)).astype(np.int8) for l in lengths]
    db = pack_sequences(np.concatenate(seqs), lengths, None)
    eng = SearchEngine(db, SearchConfig(matrix=matrix, open_gap=og,
                                        extend_gap=eg, top=min(5, n)))
    q = rng.integers(0, 23, int(rng.integers(1, 50))).astype(np.int8)
    res = eng.search(q)
    sm = get_submat(matrix)
    want = sorted((sw_score_numpy(q, s, sm, og, eg) for s in seqs),
                  reverse=True)[:min(5, n)]
    assert res.scores.tolist() == want
