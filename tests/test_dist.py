"""Distributed search on a virtual 8-device CPU mesh: parity with the
single-chip engine and with the oracle."""

import numpy as np
import pytest

import jax

from oswald_tpu.submat import get_submat
from oswald_tpu.core import sw_score_numpy
from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig
from oswald_tpu.dist import DistributedSearchEngine, make_device_mesh, \
    shard_groups

from conftest import random_protein


def _make_db(rng, n, lmax, bin_cost=None):
    lengths = rng.integers(1, lmax, size=n)
    seqs = [random_protein(rng, int(l)) for l in lengths]
    flat = np.concatenate(seqs)
    titles = [f"seq{i}" for i in range(n)]
    kw = {"bin_cost": bin_cost} if bin_cost is not None else {}
    return pack_sequences(flat, lengths, titles, **kw), seqs, lengths


def test_mesh_has_8_devices():
    assert jax.device_count() == 8
    assert make_device_mesh().devices.size == 8


def test_shard_groups_pads_to_multiple():
    rng = np.random.default_rng(1)
    db, _, _ = _make_db(rng, 1100, 80)   # 2 groups in one bin
    (L,) = db.bin_lengths
    padded = shard_groups(db.bins[L], 8)
    assert padded["seq"].shape[0] == 8
    assert (padded["id"][2:] == -1).all()
    # original groups untouched
    np.testing.assert_array_equal(padded["seq"][:2], db.bins[L]["seq"])


@pytest.mark.parametrize("profile_mode", ["precompute", "stream"])
def test_distributed_matches_single_chip(rng, profile_mode):
    # bin_cost=1 forces per-group bins including odd-64 tails
    db, seqs, lengths = _make_db(rng, 2100, 180, bin_cost=1)
    assert any(L % 128 for L in db.bin_lengths), "want a tail-chunk bin"
    cfg = SearchConfig(top=10, profile_mode=profile_mode)
    single = SearchEngine(db, SearchConfig(top=10))
    dist = DistributedSearchEngine(db, cfg)
    q = random_protein(rng, 77)
    r1 = single.search(q)
    r2 = dist.search(q)
    np.testing.assert_array_equal(r1.scores, r2.scores)
    np.testing.assert_array_equal(r1.seq_ids, r2.seq_ids)
    assert r1.titles == r2.titles


@pytest.mark.parametrize("profile_mode", ["precompute", "stream"])
def test_dist_fused_dispatch_matches_per_bin(rng, profile_mode):
    """The fused whole-search shard_map program (one collective merge)
    must match the per-bin path bit-for-bit, including tie-breaks and
    the moments that feed the significance fit — on a multi-bin db with
    tail chunks and a dummy-block-skip query length."""
    # 1800 seqs: below stats.tail_calibrate's 2000-sequence floor, so
    # BOTH paths fit moment-only statistics and the strict comparison
    # holds (the fused path streams the whole-db tail summary, the
    # per-bin path cannot — above the floor their lambda legitimately
    # differs; scores/ranks are bit-identical regardless)
    db, seqs, lengths = _make_db(rng, 1800, 180, bin_cost=1)
    assert len(db.bin_lengths) > 1
    per_bin = DistributedSearchEngine(
        db, SearchConfig(top=12, profile_mode=profile_mode,
                         fused_dispatch=False))
    fused = DistributedSearchEngine(
        db, SearchConfig(top=12, profile_mode=profile_mode,
                         fused_dispatch=True))
    for qlen in (77, 64):            # skip variant + branch-free variant
        q = random_protein(rng, qlen)
        r1, r2 = per_bin.search(q), fused.search(q)
        np.testing.assert_array_equal(r1.scores, r2.scores)
        np.testing.assert_array_equal(np.asarray(r1.seq_ids),
                                      np.asarray(r2.seq_ids))
        assert r1.titles == r2.titles
        if r1.evalues is not None:
            # the score moments are fp32 sums: per-bin partials (per-bin
            # path) vs one flat sum (fused) round differently at ~1e-5
            # relative — scores/ranks above are still bit-identical
            np.testing.assert_allclose(r1.evalues, r2.evalues, rtol=1e-3)


def test_distributed_matches_oracle_topk(rng):
    db, seqs, lengths = _make_db(rng, 600, 90)
    cfg = SearchConfig(top=5)
    dist = DistributedSearchEngine(db, cfg)
    q = random_protein(rng, 40)
    r = dist.search(q)
    sm = get_submat("blosum62")
    order = np.argsort(lengths, kind="stable")
    want = np.array([sw_score_numpy(q, seqs[src], sm) for src in order])
    ids = np.arange(len(order))
    top = np.lexsort((ids, -want))[:5]
    np.testing.assert_array_equal(r.scores, want[top])
    np.testing.assert_array_equal(r.seq_ids, top)


def test_distributed_topk_larger_than_shard(rng):
    """k above a shard's slot count must still return the exact global
    top-k (the per-shard cap only limits each shard's contribution)."""
    db, seqs, lengths = _make_db(rng, 600, 60)   # 1 bin, 1 group global
    k = 50
    dist = DistributedSearchEngine(db, SearchConfig(top=k))
    single = SearchEngine(db, SearchConfig(top=k))
    q = random_protein(rng, 30)
    r1, r2 = single.search(q), dist.search(q)
    np.testing.assert_array_equal(r1.scores, r2.scores)
    np.testing.assert_array_equal(r1.seq_ids, r2.seq_ids)


def test_distributed_search_many_batched(rng):
    db, seqs, lengths = _make_db(rng, 1500, 150)
    dist = DistributedSearchEngine(db, SearchConfig(top=6))
    queries = [random_protein(rng, int(n)) for n in (15, 40, 40, 90)]
    batched = dist.search_many(queries, batch=True)
    seq_res = dist.search_many(queries, batch=False)
    for rb, rs in zip(batched, seq_res):
        np.testing.assert_array_equal(rb.scores, rs.scores)
        np.testing.assert_array_equal(rb.seq_ids, rs.seq_ids)
    assert dist.metrics.count("search_batch") == 1


@pytest.mark.parametrize("profile_mode", ["precompute", "stream"])
def test_dist_score_all_matches_single_chip(rng, profile_mode):
    """score_all (the -H histogram path) on the 8-device mesh: the
    per-sequence score multiset must equal the single-chip engine's."""
    db, seqs, lengths = _make_db(rng, 1300, 150, bin_cost=1)
    single = SearchEngine(db, SearchConfig(top=5))
    dist = DistributedSearchEngine(
        db, SearchConfig(top=5, profile_mode=profile_mode))
    q = random_protein(rng, 47)

    sa = np.asarray(single.score_all(q))
    sm = np.asarray(single.ids_flat)
    da = dist.score_all(q)
    dm = dist.ids_flat
    assert da.shape == dm.shape
    want = dict(zip(sm[sm >= 0].tolist(), sa[sm >= 0].tolist()))
    got = dict(zip(dm[dm >= 0].tolist(), da[dm >= 0].tolist()))
    assert got == want


def test_dist_score_all_host_stream_refuses(rng):
    db, _, _ = _make_db(rng, 600, 60)
    dist = DistributedSearchEngine(
        db, SearchConfig(top=5, profile_mode="host_stream"))
    with pytest.raises(ValueError, match="host_stream"):
        dist.score_all(random_protein(rng, 30))
