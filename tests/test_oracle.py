"""Oracle self-consistency: scalar numpy DP vs anti-diagonal jax scorer."""

import numpy as np
import pytest

from oswald_tpu.alphabet import encode, decode, DUMMY
from oswald_tpu.submat import get_submat, MATRIX_NAMES
from oswald_tpu.core import sw_score_numpy, sw_score_diag, sw_score_diag_batch

from conftest import random_protein


def test_encode_decode_roundtrip():
    s = "ACDEFGHIKLMNPQRSTVWXYZ"
    codes = encode(s)
    assert decode(codes) == s
    # J, O, U and junk map to dummy
    assert (encode("JOU*1 j") == DUMMY).all()
    # lowercase accepted
    assert (encode("acd") == encode("ACD")).all()


def test_submat_properties():
    for name in MATRIX_NAMES:
        m = get_submat(name)
        assert m.shape == (24, 24) and m.dtype == np.int8
        assert (m[DUMMY, :] == 0).all() and (m[:, DUMMY] == 0).all()
        assert (m[:23, :23] == m[:23, :23].T).all()
    with pytest.raises(ValueError):
        get_submat("blosum100")


def test_known_alignment_scores():
    b62 = get_submat("blosum62")
    # identical sequences: score = sum of diagonal matches
    s = encode("HEAGAWGHEE")
    expect = sum(int(b62[c, c]) for c in s)
    assert sw_score_numpy(s, s, b62) == expect
    # classic textbook pair (Durbin et al.), BLOSUM50-like checks are
    # matrix-specific; just pin a few regression values computed once with
    # the scalar oracle.
    a = encode("HEAGAWGHEE")
    b = encode("PAWHEAE")
    assert sw_score_numpy(a, b, b62, 10, 2) == 17
    assert sw_score_numpy(a, b, get_submat("blosum50"), 10, 2) == 24


def test_gap_affine_behaviour():
    b62 = get_submat("blosum62")
    a = encode("AAAACCCC")
    b = encode("AAAATTTTCCCC")  # needs a 4-gap
    s_open_cheap = sw_score_numpy(a, b, b62, 2, 1)
    s_open_dear = sw_score_numpy(a, b, b62, 20, 2)
    assert s_open_cheap > s_open_dear


def test_diag_matches_numpy_random(rng):
    b62 = get_submat("blosum62")
    for m, n in [(1, 1), (3, 7), (17, 5), (33, 64), (50, 50)]:
        a = random_protein(rng, m)
        b = random_protein(rng, n)
        want = sw_score_numpy(a, b, b62, 10, 2)
        got = int(sw_score_diag(a.astype(np.int32), b.astype(np.int32),
                                np.int32(n), b62, 10, 2))
        assert got == want, (m, n)


def test_diag_padding_invariance(rng):
    """Dummy padding of query or subject must not change the score."""
    b62 = get_submat("blosum62")
    a = random_protein(rng, 20)
    b = random_protein(rng, 37)
    want = sw_score_numpy(a, b, b62, 10, 2)
    a_pad = np.concatenate([a, np.full(12, DUMMY, np.int8)])
    b_pad = np.concatenate([b, np.full(27, DUMMY, np.int8)])
    got = int(sw_score_diag(a_pad.astype(np.int32), b_pad.astype(np.int32),
                            np.int32(37), b62, 10, 2))
    assert got == want
    # also with n_b covering the padded tail (dummy scores 0 everywhere)
    got2 = int(sw_score_diag(a_pad.astype(np.int32), b_pad.astype(np.int32),
                             np.int32(64), b62, 10, 2))
    assert got2 == want


def test_diag_all_matrices_and_gaps(rng):
    a = random_protein(rng, 24)
    b = random_protein(rng, 40)
    for name in MATRIX_NAMES:
        sm = get_submat(name)
        for og, eg in [(10, 2), (5, 1), (0, 1), (40, 3)]:
            want = sw_score_numpy(a, b, sm, og, eg)
            got = int(sw_score_diag(a.astype(np.int32), b.astype(np.int32),
                                    np.int32(40), sm, og, eg))
            assert got == want, (name, og, eg)


def test_diag_batch(rng):
    b62 = get_submat("blosum62")
    a = random_protein(rng, 31)
    B, n = 9, 48
    lens = rng.integers(1, n + 1, size=B).astype(np.int32)
    bs = np.full((B, n), DUMMY, dtype=np.int32)
    raw = [random_protein(rng, int(l)) for l in lens]
    for i, r in enumerate(raw):
        bs[i, : len(r)] = r
    got = np.asarray(sw_score_diag_batch(a.astype(np.int32), bs, lens, b62))
    want = np.array([sw_score_numpy(a, r, b62) for r in raw])
    np.testing.assert_array_equal(got, want)
