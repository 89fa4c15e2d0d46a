"""Streaming (out-of-core) preprocess must produce a database identical to
the in-memory path."""

import numpy as np

from oswald_tpu.alphabet import ALPHABET
from oswald_tpu.io import pack_sequences, parse_fasta
from oswald_tpu.io.stream import preprocess_db_streaming

from conftest import random_protein


def _write_db(tmp_path, rng, n=400, lmax=200):
    """Write a random FASTA and return (path, in-memory PackedDB) — the
    oracle the compressed/streaming paths are compared against."""
    p = str(tmp_path / "in.fasta")
    _write_fasta(p, rng, n, lmax)
    titles, flat, lengths = parse_fasta(p)
    return p, pack_sequences(flat, lengths, titles)


def _assert_db_equal(got, want):
    assert got.n_seqs == want.n_seqs
    assert got.n_residues == want.n_residues
    assert got.titles == want.titles
    assert got.bin_lengths == want.bin_lengths
    for L in want.bin_lengths:
        for k in ("seq", "len", "id"):
            np.testing.assert_array_equal(
                np.asarray(got.bins[L][k]), np.asarray(want.bins[L][k]),
                err_msg=f"bin {L} {k}")


def _write_fasta(path, rng, n, lmax):
    seqs = []
    with open(path, "w") as f:
        for i in range(n):
            s = random_protein(rng, int(rng.integers(1, lmax)))
            seqs.append(s)
            body = "".join(ALPHABET[c] for c in s)
            f.write(f">rec{i} d{i}\n")
            for j in range(0, len(body), 57):
                f.write(body[j:j + 57] + "\n")
    return seqs


def test_streaming_matches_in_memory(tmp_path, rng):
    p = str(tmp_path / "db.fasta")
    seqs = _write_fasta(p, rng, 2300, 250)
    # tiny blocks force many record-boundary splits
    db_s = preprocess_db_streaming(p, str(tmp_path / "s"),
                                   block_bytes=4096, verbose=False)
    titles, flat, lengths = parse_fasta(p)
    db_m = pack_sequences(flat, lengths, titles)
    assert db_s.n_seqs == db_m.n_seqs
    assert db_s.n_residues == db_m.n_residues
    assert db_s.titles == db_m.titles
    assert db_s.bin_lengths == db_m.bin_lengths
    for L in db_m.bin_lengths:
        for k in ("seq", "len", "id"):
            np.testing.assert_array_equal(
                np.asarray(db_s.bins[L][k]), db_m.bins[L][k],
                err_msg=f"bin {L} {k}")


def test_streaming_single_block(tmp_path, rng):
    p = str(tmp_path / "db.fasta")
    _write_fasta(p, rng, 40, 60)
    db = preprocess_db_streaming(p, str(tmp_path / "s1"), verbose=False)
    assert db.n_seqs == 40


def test_streaming_numpy_fallback_matches_native(tmp_path, rng):
    """The pure-numpy pack/parse fallback builds a bit-identical artifact."""
    import os
    p = str(tmp_path / "db.fasta")
    _write_fasta(p, rng, 1700, 200)
    db_nat = preprocess_db_streaming(p, str(tmp_path / "nat"),
                                     block_bytes=65536, verbose=False)
    os.environ["OSWALD_NO_NATIVE"] = "1"
    try:
        db_py = preprocess_db_streaming(p, str(tmp_path / "py"),
                                        block_bytes=65536, verbose=False)
    finally:
        del os.environ["OSWALD_NO_NATIVE"]
    assert db_nat.titles == db_py.titles
    assert db_nat.bin_lengths == db_py.bin_lengths
    for L in db_py.bin_lengths:
        for k in ("seq", "len", "id"):
            np.testing.assert_array_equal(
                np.asarray(db_nat.bins[L][k]), np.asarray(db_py.bins[L][k]))


def test_streaming_invalid_input_raises_and_cleans_up(tmp_path):
    """Non-FASTA input must raise ValueError and leave no staging temp
    files behind (the out-of-core path spills to <out>.oswt/*.tmp)."""
    import os
    import pytest
    bad = tmp_path / "junk.bin"
    bad.write_bytes(b"\x00\x01not a fasta at all\njust bytes\n" * 100)
    out = tmp_path / "junkdb"
    with pytest.raises(ValueError):
        preprocess_db_streaming(str(bad), str(out), verbose=False)
    d = str(out) + ".oswt"
    leftovers = [f for f in (os.listdir(d) if os.path.isdir(d) else [])
                 if f.endswith(".tmp")]
    assert leftovers == [], leftovers


def test_streaming_empty_file(tmp_path):
    empty = tmp_path / "empty.fasta"
    empty.write_bytes(b"")
    db = preprocess_db_streaming(str(empty), str(tmp_path / "emptydb"),
                                 verbose=False)
    assert db.n_seqs == 0 and db.n_residues == 0


def test_streaming_gzip_matches_plain(tmp_path, rng):
    """Out-of-core preprocess reads compressed FASTA transparently."""
    import gzip
    p, db_m = _write_db(tmp_path, rng, n=400)
    gz = tmp_path / "in.fasta.gz"
    gz.write_bytes(gzip.compress(open(p, "rb").read()))
    out = preprocess_db_streaming(str(gz), str(tmp_path / "gz"),
                                  block_bytes=1 << 16, verbose=False)
    _assert_db_equal(out, db_m)


def test_streaming_bzip2_matches_plain(tmp_path, rng):
    import bz2
    p, db_m = _write_db(tmp_path, rng, n=350)
    bz = tmp_path / "in.fasta.bz2"
    bz.write_bytes(bz2.compress(open(p, "rb").read()))
    out = preprocess_db_streaming(str(bz), str(tmp_path / "bz"),
                                  block_bytes=1 << 16, verbose=False)
    _assert_db_equal(out, db_m)


def test_streaming_xz_matches_plain(tmp_path, rng):
    import lzma
    p, db_m = _write_db(tmp_path, rng, n=350)
    xz = tmp_path / "in.fasta.xz"
    xz.write_bytes(lzma.compress(open(p, "rb").read()))
    out = preprocess_db_streaming(str(xz), str(tmp_path / "xz"),
                                  block_bytes=1 << 16, verbose=False)
    _assert_db_equal(out, db_m)


def test_streaming_gzip_tiny_blocks_spill_path(tmp_path, rng):
    """Compressed input through 4 KiB blocks AND a forced staging spill
    (ram_budget_bytes=0) — record-boundary splits + the temp-file path."""
    import gzip
    p, db_m = _write_db(tmp_path, rng, n=600, lmax=120)
    gz = tmp_path / "tiny.fasta.gz"
    gz.write_bytes(gzip.compress(open(p, "rb").read()))
    out = preprocess_db_streaming(str(gz), str(tmp_path / "tb"),
                                  block_bytes=4096, verbose=False,
                                  ram_budget_bytes=0)
    _assert_db_equal(out, db_m)
