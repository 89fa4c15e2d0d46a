"""Mesh-adaptive bin geometry (dist/repack.py): the merge DP, the lazy
column-padded view, and bit-identical distributed results through a
merge."""

import numpy as np

from oswald_tpu.alphabet import DUMMY
from oswald_tpu.io import pack_sequences
from oswald_tpu.io.db import GROUP_LANES, SUBLANES, LANES
from oswald_tpu.dist.repack import (mesh_bin_plan, plan_sharded_cells,
                                    repack_for_mesh, _MergedGroups)


def _round_up(x, q):
    return -(-x // q) * q


def _brute_best(group_Ls, quanta, bin_cost):
    """Exhaustive per-group partition DP (input is tiny) — the
    vectorised DP's oracle."""
    G = len(group_Ls)
    best = [float("inf")] * (G + 1)
    best[0] = 0.0
    for j in range(1, G + 1):
        for i in range(j):
            c = best[i] + bin_cost + \
                _round_up(j - i, quanta) * group_Ls[j - 1] * GROUP_LANES
            best[j] = min(best[j], c)
    return best[G]


def test_mesh_bin_plan_optimal_vs_bruteforce(rng):
    for _ in range(20):
        G = int(rng.integers(1, 40))
        Ls = np.sort(rng.choice(np.arange(1, 40) * 32, size=G,
                                replace=True))
        quanta = int(rng.choice([2, 8, 16, 64]))
        plan = mesh_bin_plan(Ls, quanta)
        cost = plan_sharded_cells(Ls, quanta, plan) + \
            262_144 * len(plan)
        assert abs(cost - _brute_best(list(Ls), quanta, 262_144)) < 1e-6
        # plan covers every group exactly once, in order
        flat = [i for lo, hi in plan for i in range(lo, hi)]
        assert flat == list(range(G))


def test_mesh_bin_plan_splits_runs_for_quanta():
    """A 30-group run followed by longer runs must cut at 16 so the
    first bin shard-pads nothing (the bin-level merge could not)."""
    Ls = np.concatenate([np.full(30, 64), np.full(25, 96),
                         np.full(24, 128)])
    plan = mesh_bin_plan(Ls, 16, bin_cost=0)
    cells = plan_sharded_cells(Ls, 16, plan)
    # ideal floor: every group computed once at its own length, final
    # count rounded to 16 somewhere
    floor = int((Ls * GROUP_LANES).sum())
    assert cells <= floor * 1.15
    # and at least one cut falls inside a run (not at 30 or 55)
    cuts = {hi for _, hi in plan[:-1]}
    assert any(c not in (30, 55) for c in cuts) or not cuts


def test_merged_view_matches_eager_concat(rng):
    parts, Ls = [], [64, 96, 160]
    for L in Ls:
        parts.append((rng.integers(0, 24, size=(int(rng.integers(1, 4)),
                                                L, SUBLANES, LANES))
                      .astype(np.int8), L))
    L_out = max(Ls)
    view = _MergedGroups(parts, L_out)
    eager = np.concatenate(
        [np.pad(arr, ((0, 0), (0, L_out - L), (0, 0), (0, 0)),
                constant_values=DUMMY) for arr, L in parts])
    assert view.shape == eager.shape
    np.testing.assert_array_equal(np.asarray(view), eager)
    G = eager.shape[0]
    for lo, hi in [(0, G), (1, G - 1), (2, 3), (G - 1, G), (0, 0)]:
        np.testing.assert_array_equal(view[lo:hi], eager[lo:hi])
    # tuple indexing (the sequence_of access pattern)
    np.testing.assert_array_equal(view[1, :50, 3, 17], eager[1, :50, 3, 17])
    np.testing.assert_array_equal(view[G - 1], eager[G - 1])


def test_repack_preserves_sequences(rng):
    lengths = rng.integers(1, 500, size=4000)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    db = pack_sequences(flat, lengths, None)
    rp = repack_for_mesh(db, quanta=16)
    assert rp.n_seqs == db.n_seqs and rp.n_residues == db.n_residues
    assert len(rp.bin_lengths) <= len(db.bin_lengths)
    # every sequence survives the merge bit-identically
    for sid in rng.integers(0, db.n_seqs, size=32):
        np.testing.assert_array_equal(rp.sequence_of(int(sid)),
                                      db.sequence_of(int(sid)))
    # ids/lengths per merged bin line up with group order
    tot = sum(rp.bins[L]["id"].shape[0] for L in rp.bin_lengths)
    assert tot == sum(db.bins[L]["id"].shape[0] for L in db.bin_lengths)


def test_repack_noop_returns_same_object(rng):
    lengths = rng.integers(200, 260, size=2000)     # one bin either way
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    db = pack_sequences(flat, lengths, None)
    assert repack_for_mesh(db, quanta=2) is db


def test_distributed_results_identical_through_merge(rng):
    """A quanta-16 repack on the 8-device mesh must return bit-identical
    hits to the single-chip engine on the unmerged db (the repack is
    wired into DistributedSearchEngine, so this exercises the real
    path)."""
    from oswald_tpu.engine import SearchEngine, SearchConfig
    from oswald_tpu.dist import DistributedSearchEngine, make_device_mesh
    cpu_mesh8 = make_device_mesh()

    lengths = rng.integers(1, 300, size=3000)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    db = pack_sequences(flat, lengths, None)
    cfg = SearchConfig(top=12)
    se = SearchEngine(db, cfg)
    de = DistributedSearchEngine(db, cfg, mesh=cpu_mesh8)
    # the engine must have applied a merge for this geometry (3 groups,
    # quanta 16) or at least run the repack path
    assert de.src_db is db
    for qlen in (33, 170):
        q = rng.integers(0, 23, size=qlen).astype(np.int8)
        rs, rd = se.search(q), de.search(q)
        np.testing.assert_array_equal(rs.scores, rd.scores)
        np.testing.assert_array_equal(rs.seq_ids, rd.seq_ids)


def test_merged_view_index_edges(rng):
    arr = rng.integers(0, 24, size=(3, 64, SUBLANES, LANES)).astype(np.int8)
    view = _MergedGroups([(arr, 64)], 96)
    # negative index
    np.testing.assert_array_equal(view[-1][:64], arr[2])
    assert (np.asarray(view[-1][64:]) == DUMMY).all()
    import pytest
    with pytest.raises(IndexError):
        view[3]
    with pytest.raises(IndexError):
        view[::2]


def test_mesh_bin_plan_restricted_near_optimal(monkeypatch, rng):
    """Past _EXACT_DP_MAX_GROUPS the candidate-restricted DP must land
    within a fraction of a percent of the exact optimum."""
    import oswald_tpu.dist.repack as rp
    G = 22000
    # realistic shape: ~30 quantised length levels, ascending
    levels = np.sort(rng.choice(np.arange(2, 60) * 32, size=30,
                                replace=False))
    counts = rng.integers(200, 1200, size=30)
    counts = (counts * (G / counts.sum())).astype(int)
    counts[-1] += G - counts.sum()
    Ls = np.repeat(levels, counts)
    quanta = 16
    plan_r = rp.mesh_bin_plan(Ls, quanta)           # restricted (G > 20k)
    cost_r = rp.plan_sharded_cells(Ls, quanta, plan_r)
    monkeypatch.setattr(rp, "_EXACT_DP_MAX_GROUPS", 10**9)
    plan_e = rp.mesh_bin_plan(Ls, quanta)           # exact
    cost_e = rp.plan_sharded_cells(Ls, quanta, plan_e)
    assert cost_e <= cost_r <= cost_e * 1.005, (cost_r, cost_e)
