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


def test_native_parse_titles_bytes_mode(rng):
    data, _ = _random_fasta(rng, 41, messy=True)
    tl, s1, l1 = fasta.parse_fasta_bytes(data)
    (jn, lens_n), s2, l2 = native.parse_fasta_bytes(data, titles="bytes")
    (jp, lens_p), s3, l3 = fasta.parse_fasta_bytes(data, titles="bytes")
    assert jn == jp
    np.testing.assert_array_equal(lens_n, lens_p)
    # joined bytes decode back to the list-mode titles
    got = jn.decode("utf-8", errors="replace").split("\n")[:-1]
    assert got == tl
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(s2, s3)
    # titles=None skips title work but not sequence parity
    none_t, s4, l4 = native.parse_fasta_bytes(data, titles=None)
    assert none_t is None
    np.testing.assert_array_equal(s1, s4)
    np.testing.assert_array_equal(l1, l4)


def test_native_encode_mt_chunk_boundaries(rng):
    """The OpenMP scan activates above 4 MiB; records must survive
    straddling the per-thread chunk boundaries (lengths accumulate across
    chunks, residues land contiguously)."""
    parts = []
    seqs = []
    i = 0
    total = 0
    while total < 6 << 20:                  # > 4 MiB threshold
        L = int(rng.integers(1, 40000))     # long records straddle chunks
        s = "".join(rng.choice(list(ALPHABET + "x*")) for _ in range(L))
        seqs.append(s)
        body = "\n".join(s[j:j + 70] for j in range(0, len(s), 70))
        parts.append(f">r{i} desc\n" + body + "\n")
        total += len(parts[-1])
        i += 1
    data = "".join(parts).encode()
    t1, s1, l1 = fasta.parse_fasta_bytes(data)
    t2, s2, l2 = native.parse_fasta_bytes(data)
    assert t1 == t2
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(s1, s2)


def test_native_pack_groups_sl_matches_offsets_pack(rng):
    """(starts, lens) packing through a permutation == contiguous-offsets
    packing of the permuted copy."""
    n = 2100
    lengths = rng.integers(1, 120, size=n).astype(np.int64)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    starts_file = np.concatenate([[0], np.cumsum(lengths)])
    order = rng.permutation(n)
    # permuted copy for the reference path
    perm_flat = np.concatenate(
        [flat[starts_file[k]:starts_file[k + 1]] for k in order])
    perm_offs = np.concatenate([[0], np.cumsum(lengths[order])])
    group_starts = np.array([0, 1024, 2048, n], np.int64)
    Ls = np.array([128, 192, 128], np.int64)
    want = native.pack_groups(perm_flat, perm_offs, group_starts, Ls)
    got_flat = native.pack_groups_sl(flat, starts_file[order],
                                     lengths[order], group_starts, Ls)
    off = 0
    for w, L in zip(want, Ls):
        g = got_flat[off:off + L * 1024].reshape(int(L), 1024)
        np.testing.assert_array_equal(w, g)
        off += L * 1024
