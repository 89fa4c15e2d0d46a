"""Batched multi-query search parity with per-query search."""

import numpy as np

from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig

from conftest import random_protein


def test_search_many_batched_matches_sequential(rng):
    lengths = rng.integers(5, 150, size=1200)
    flat = np.concatenate([random_protein(rng, int(l)) for l in lengths])
    db = pack_sequences(flat, lengths, [f"s{i}" for i in range(1200)])
    eng = SearchEngine(db, SearchConfig(top=7))
    queries = [random_protein(rng, int(n)) for n in (12, 30, 45, 70, 100)]
    batched = eng.search_many(queries, batch=True)
    seq = eng.search_many(queries, batch=False)
    for rb, rs in zip(batched, seq):
        np.testing.assert_array_equal(rb.scores, rs.scores)
        np.testing.assert_array_equal(rb.seq_ids, rs.seq_ids)
        assert rb.titles == rs.titles
    assert eng.metrics.count("search_batch") == 1


def test_search_many_stream_mode_batched(rng):
    """stream mode now batches too (one compiled program per (m_pad, bin)
    with in-scan profile builds): parity with per-query + precompute."""
    lengths = rng.integers(5, 150, size=900)
    flat = np.concatenate([random_protein(rng, int(l)) for l in lengths])
    db = pack_sequences(flat, lengths, [f"s{i}" for i in range(900)])
    pre = SearchEngine(db, SearchConfig(top=6))
    st = SearchEngine(db, SearchConfig(top=6, profile_mode="stream"))
    queries = [random_protein(rng, int(n)) for n in (20, 40, 64, 90)]
    want = pre.search_many(queries, batch=True)
    got = st.search_many(queries, batch=True)
    seq = st.search_many(queries, batch=False)
    for rw, rg, rs in zip(want, got, seq):
        np.testing.assert_array_equal(rg.scores, rw.scores)
        np.testing.assert_array_equal(rg.seq_ids, rw.seq_ids)
        np.testing.assert_array_equal(rg.scores, rs.scores)
        np.testing.assert_allclose(rg.evalues, rw.evalues, rtol=1e-3)


def test_dist_search_many_stream_mode_batched(rng):
    from oswald_tpu.dist import DistributedSearchEngine, make_device_mesh
    lengths = rng.integers(5, 120, size=700)
    flat = np.concatenate([random_protein(rng, int(l)) for l in lengths])
    db = pack_sequences(flat, lengths, [f"s{i}" for i in range(700)])
    single = SearchEngine(db, SearchConfig(top=5))
    deng = DistributedSearchEngine(
        db, SearchConfig(top=5, profile_mode="stream"),
        mesh=make_device_mesh(8))
    queries = [random_protein(rng, int(n)) for n in (25, 50, 80)]
    want = single.search_many(queries, batch=True)
    got = deng.search_many(queries, batch=True)
    for rw, rg in zip(want, got):
        np.testing.assert_array_equal(rg.scores, rw.scores)
        np.testing.assert_array_equal(rg.seq_ids, rw.seq_ids)
        np.testing.assert_allclose(rg.evalues, rw.evalues, rtol=1e-3)


def test_query_packing_parity_and_chunking(rng):
    """Packed-segment batching (batch_query_pack_rows): many short queries
    of one padded length, more than one pack chunk, exact parity with the
    unpacked path and with per-query search; stats agree too."""
    lengths = rng.integers(5, 150, size=800)
    flat = np.concatenate([random_protein(rng, int(l)) for l in lengths])
    db = pack_sequences(flat, lengths, [f"s{i}" for i in range(800)])
    packed_eng = SearchEngine(db, SearchConfig(
        top=6, batch_query_pack_rows=256))       # m_pad 64 -> S=4
    plain_eng = SearchEngine(db, SearchConfig(
        top=6, batch_query_pack_rows=0))
    # 10 queries all padding to 64 -> chunks of 4+4+2 packed segments
    queries = [random_protein(rng, int(n))
               for n in rng.integers(10, 64, size=10)]
    got = packed_eng.search_many(queries, batch=True)
    want = plain_eng.search_many(queries, batch=True)
    seq = [packed_eng.search(q) for q in queries]
    for rg, rw, rs in zip(got, want, seq):
        np.testing.assert_array_equal(rg.scores, rw.scores)
        np.testing.assert_array_equal(rg.seq_ids, rw.seq_ids)
        np.testing.assert_array_equal(rg.scores, rs.scores)
        np.testing.assert_allclose(rg.evalues, rw.evalues, rtol=1e-4)
    # mixed lengths: long queries bypass packing, short ones pack
    mixed = [random_protein(rng, 30), random_protein(rng, 40),
             random_protein(rng, 300)]
    gm = packed_eng.search_many(mixed, batch=True)
    wm = plain_eng.search_many(mixed, batch=True)
    for rg, rw in zip(gm, wm):
        np.testing.assert_array_equal(rg.scores, rw.scores)
        np.testing.assert_array_equal(rg.seq_ids, rw.seq_ids)


def test_query_packing_multichunk_subjects(rng):
    """Packing across column-chunk boundaries: subjects long enough for
    C >= 2 chunks (plus a 64-tail) exercise the segment-zeroed carried
    diagonal (colHd) between chunks."""
    lengths = rng.integers(200, 600, size=300)     # bins 256..640, C>=2
    flat = np.concatenate([random_protein(rng, int(l)) for l in lengths])
    db = pack_sequences(flat, lengths, [f"s{i}" for i in range(300)])
    assert any(L >= 256 for L in db.bin_lengths)
    packed_eng = SearchEngine(db, SearchConfig(
        top=5, batch_query_pack_rows=512))
    plain_eng = SearchEngine(db, SearchConfig(
        top=5, batch_query_pack_rows=0))
    queries = [random_protein(rng, int(n))
               for n in rng.integers(20, 120, size=6)]
    got = packed_eng.search_many(queries, batch=True)
    want = plain_eng.search_many(queries, batch=True)
    for rg, rw in zip(got, want):
        np.testing.assert_array_equal(rg.scores, rw.scores)
        np.testing.assert_array_equal(rg.seq_ids, rw.seq_ids)

    # stream-mode packing over the same multi-chunk db
    st = SearchEngine(db, SearchConfig(
        top=5, profile_mode="stream", batch_query_pack_rows=512))
    gs = st.search_many(queries, batch=True)
    for rg, rw in zip(gs, want):
        np.testing.assert_array_equal(rg.scores, rw.scores)


def test_mixed_length_packing_one_program(rng):
    """UNEQUAL query lengths in one packed bin (sw_chunk seg_map): a mixed
    100-400aa batch whose row total fits one bin must give exact parity
    with the unpacked path — the general form of the reference's
    arbitrary-m per-chunk query loop (FPGAsearch.c:204-219)."""
    from oswald_tpu.engine.search import mixed_pack_plan
    lengths = rng.integers(5, 150, size=600)
    flat = np.concatenate([random_protein(rng, int(l)) for l in lengths])
    db = pack_sequences(flat, lengths, [f"s{i}" for i in range(600)])
    packed_eng = SearchEngine(db, SearchConfig(
        top=6, batch_query_pack_rows=1024))
    plain_eng = SearchEngine(db, SearchConfig(
        top=6, batch_query_pack_rows=0))
    qlens = [100, 173, 254, 399, 311, 47, 128, 222]     # 1704 rows total
    queries = [random_protein(rng, n) for n in qlens]
    # the plan must put ALL of these in packed bins (none exceed 1024 rows)
    bins, rest = mixed_pack_plan(1024, packed_eng.config.u_rows, queries)
    assert rest == []
    assert {i for b in bins for i in b[0]} == set(range(len(queries)))
    got = packed_eng.search_many(queries, batch=True)
    want = plain_eng.search_many(queries, batch=True)
    seq = [plain_eng.search(q) for q in queries]
    for rg, rw, rs in zip(got, want, seq):
        np.testing.assert_array_equal(rg.scores, rw.scores)
        np.testing.assert_array_equal(rg.seq_ids, rw.seq_ids)
        np.testing.assert_array_equal(rg.scores, rs.scores)
        np.testing.assert_allclose(rg.evalues, rw.evalues, rtol=1e-4)


def test_mixed_pack_plan_invariants(rng):
    """The FFD planner's layout contract (what sw_chunk's seg_map
    requires): slots contiguous and non-decreasing per bin, row/segment
    caps respected, every query placed exactly once, query residues
    land at their segment offsets."""
    from oswald_tpu.engine.search import mixed_pack_plan, MIXED_PACK_SEGS
    from oswald_tpu.alphabet import DUMMY
    u = 8
    qlens = list(rng.integers(1, 900, size=50)) + [3000, 1025]
    queries = [rng.integers(0, 23, int(n)).astype(np.int32) for n in qlens]
    bins, rest = mixed_pack_plan(1024, u, queries)
    # too-long queries (> 1024 rows) must be routed to the batch path
    assert sorted(rest) == sorted(i for i, n in enumerate(qlens)
                                  if -(-n // u) > 128)
    placed = [i for b in bins for i in b[0]]
    assert sorted(placed + rest) == list(range(len(queries)))
    for idxs, qp, sm, used in bins:
        assert len(idxs) <= MIXED_PACK_SEGS
        assert qp.shape[0] <= 1024 and qp.shape[0] % u == 0
        assert sm.shape[0] == qp.shape[0] // u
        assert np.all(np.diff(sm) >= 0) and sm.max() < MIXED_PACK_SEGS
        off = 0
        for s, i in enumerate(idxs):
            b = -(-queries[i].size // u)
            np.testing.assert_array_equal(sm[off:off + b], s)
            np.testing.assert_array_equal(
                qp[off * u: off * u + queries[i].size], queries[i])
            # in-segment padding rows are DUMMY
            assert np.all(qp[off * u + queries[i].size:
                             (off + b) * u] == DUMMY)
            off += b
        # used = real blocks (the kernel's dummy-block skip trip count):
        # everything past it is trailing filler
        assert used == off and used <= sm.shape[0]
    # encoding guard: raw ASCII codes must be rejected
    import pytest
    with pytest.raises(ValueError, match="encode"):
        mixed_pack_plan(1024, u, [np.frombuffer(b"MKT", np.uint8), queries[0]])


def test_dist_mixed_length_packing(rng):
    """Distributed mixed-length packed bins == single-chip results (the
    planner is shared; the shard_map path adds the top-k merge)."""
    from oswald_tpu.dist import DistributedSearchEngine, make_device_mesh
    lengths = rng.integers(5, 140, size=500)
    flat = np.concatenate([random_protein(rng, int(l)) for l in lengths])
    db = pack_sequences(flat, lengths, [f"s{i}" for i in range(500)])
    single = SearchEngine(db, SearchConfig(top=5))
    deng = DistributedSearchEngine(db, SearchConfig(top=5),
                                   mesh=make_device_mesh(8))
    queries = [random_protein(rng, n) for n in (33, 150, 78, 260, 9)]
    want = single.search_many(queries, batch=True)
    got = deng.search_many(queries, batch=True)
    for rw, rg in zip(want, got):
        np.testing.assert_array_equal(rg.scores, rw.scores)
        np.testing.assert_array_equal(rg.seq_ids, rw.seq_ids)
        np.testing.assert_allclose(rg.evalues, rw.evalues, rtol=1e-3)
