"""Native C++ IO library vs the numpy reference implementations."""

import os

import numpy as np
import pytest

from oswald_tpu.alphabet import ALPHABET
from oswald_tpu.io import fasta, pack_sequences
from oswald_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built")


def _random_fasta(rng, n, messy=False):
    parts = []
    seqs = []
    for i in range(n):
        L = int(rng.integers(1, 200))
        s = "".join(rng.choice(list(ALPHABET + "jouxz*")) for _ in range(L))
        seqs.append(s)
        hdr = f">rec{i} some description {i}"
        body = "\n".join(s[j:j + 61] for j in range(0, len(s), 61))
        if messy and i % 3 == 0:
            hdr += "\r"
            body = body.replace("\n", "\r\n", 1) + " \t"
        parts.append(hdr + "\n" + body + "\n")
    return "".join(parts).encode(), seqs


def test_native_parse_matches_numpy(rng):
    data, _ = _random_fasta(rng, 57, messy=True)
    t1, s1, l1 = fasta.parse_fasta_bytes(data)
    t2, s2, l2 = native.parse_fasta_bytes(data)
    assert t1 == t2
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(s1, s2)


def test_native_parse_empty_records(rng):
    data = b">a\nACD\n>empty\n>b\nW\nY\n"
    t1, s1, l1 = fasta.parse_fasta_bytes(data)
    t2, s2, l2 = native.parse_fasta_bytes(data)
    assert t1 == t2 == ["a", "empty", "b"]
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(s1, s2)


def test_native_pack_matches_fallback(rng):
    lengths = rng.integers(1, 300, size=2500)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    db_native = pack_sequences(flat, lengths, None)
    os.environ["OSWALD_NO_NATIVE"] = "1"
    try:
        db_py = pack_sequences(flat, lengths, None)
    finally:
        del os.environ["OSWALD_NO_NATIVE"]
    assert db_native.bin_lengths == db_py.bin_lengths
    for L in db_py.bin_lengths:
        for k in ("seq", "len", "id"):
            np.testing.assert_array_equal(db_native.bins[L][k],
                                          db_py.bins[L][k])


def test_native_parse_rejects_invalid_like_numpy():
    for bad in (b"MKTA\n>late header\nACDE\n", b"no headers here\n"):
        with pytest.raises(ValueError):
            fasta.parse_fasta_bytes(bad)
        with pytest.raises(ValueError):
            native.parse_fasta_bytes(bad)
    # empty input is accepted by both
    assert native.parse_fasta_bytes(b"")[0] == []
