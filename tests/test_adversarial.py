"""Adversarial machine-checking of the kernel's analytical claims.

Two optimisations in kernels/sw_lanes.py rest on proofs, not just the
shipped-matrix test coverage:

1. `noadj_ok` returns a constant True — the relaxed E-update (one fewer
   op/cell) is claimed exact for EVERY scoring config.  Here the claim is
   attacked with RANDOM substitution matrices (negative-heavy,
   positive-heavy, zero-diagonal), open_gap=0, extend_gap=0 and large —
   comparing the ACTUAL kernel recurrence with noadj=True vs noadj=False
   vs the scalar numpy oracle (the reference recurrence,
   /root/reference/device/sw.cl:44-86).

2. `resolve_exact_acc_dtype` promises fp32 accumulation is used only when
   every DP intermediate is provably an exact float32 integer; the
   boundary test pins the demotion threshold to FP32_EXACT_LIMIT exactly.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from oswald_tpu.alphabet import DUMMY
from oswald_tpu.core import sw_score_numpy
from oswald_tpu.io import pack_sequences
from oswald_tpu.io.db import SUBLANES, LANES
from oswald_tpu.kernels import CHUNK_WIDTH
from oswald_tpu.engine.search import (_search_bin_stream_impl, pad_query,
                                      resolve_exact_acc_dtype, nb_or_none,
                                      SearchConfig, FP32_EXACT_LIMIT)

U_ROWS = 8


def _kernel_scores(seqs, query, sm, og, eg, noadj):
    """Score every sequence through the REAL kernel recurrence (interpret
    mode on CPU) with an arbitrary substitution matrix — the engine only
    accepts named matrices, so this drives the bin scan directly, using
    the same packing/padding layout the engine builds."""
    lengths = np.array([len(s) for s in seqs], np.int64)
    db = pack_sequences(np.concatenate(seqs).astype(np.int8), lengths, None)
    q_pad = jnp.asarray(pad_query(query, SearchConfig()))
    nb = nb_or_none(len(query), q_pad.shape[0], U_ROWS)
    gaps = jnp.asarray([og, eg], jnp.int32)
    sm_dev = jnp.asarray(sm, jnp.int8)
    # scores come back keyed by SORTED-order ids (pack_sequences sorts by
    # length ascending, stable)
    out = np.full(db.n_seqs, -1, np.int64)
    for L in db.bin_lengths:
        seq_np = np.asarray(db.bins[L]["seq"])      # [G, L, 8, 128]
        ids_np = np.asarray(db.bins[L]["id"]).reshape(-1)
        G = seq_np.shape[0]
        C = L // CHUNK_WIDTH
        main = jnp.asarray(np.ascontiguousarray(np.swapaxes(
            seq_np[:, :C * CHUNK_WIDTH].reshape(
                G, C, CHUNK_WIDTH, SUBLANES, LANES), 0, 1)))
        tail = jnp.asarray(seq_np[:, C * CHUNK_WIDTH:]) \
            if L % CHUNK_WIDTH else None
        s = np.asarray(_search_bin_stream_impl(
            q_pad, gaps, sm_dev, main, U_ROWS, interpret=True,
            acc_dtype=jnp.int32, seq_tail=tail, noadj=noadj,
            nb=nb)).reshape(-1)
        valid = ids_np >= 0
        out[ids_np[valid]] = s[valid]
    return out


def _inert_dummy(sm):
    """DUMMY row/col must score 0 (the packing invariant every shipped
    matrix holds — padding residues are score-inert)."""
    sm = np.array(sm, np.int8)
    sm[DUMMY, :] = 0
    sm[:, DUMMY] = 0
    return sm


matrix_kinds = st.sampled_from(["uniform", "positive", "zero_diag"])


def _draw_matrix(rng, kind):
    if kind == "uniform":
        sm = rng.integers(-12, 16, size=(24, 24))
    elif kind == "positive":
        # positive-heavy rows: gap-free paths accumulate fast, stressing
        # any ordering assumption between E runs and F runs
        sm = rng.integers(0, 16, size=(24, 24))
    else:
        sm = rng.integers(-12, 16, size=(24, 24))
        np.fill_diagonal(sm, 0)
    # symmetrise like real substitution matrices (not load-bearing for
    # the kernel, but keeps the inputs in-domain)
    sm = np.minimum(sm, sm.T)
    return _inert_dummy(sm)


@settings(max_examples=20, deadline=None)
@given(data=st.data())
def test_noadj_exact_for_random_matrices(data):
    """noadj=True vs noadj=False vs the scalar oracle, on random matrices
    and adversarial gap configs (og=0, eg=0 included)."""
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    kind = data.draw(matrix_kinds)
    sm = _draw_matrix(rng, kind)
    og = data.draw(st.sampled_from([0, 0, 1, 3, 10, 25, 100]))
    eg = data.draw(st.sampled_from([0, 0, 1, 2, 7, 50]))
    n = data.draw(st.integers(2, 12))
    lengths = rng.integers(1, 90, size=n)
    seqs = [rng.integers(0, 23, int(l)).astype(np.int8) for l in lengths]
    q = rng.integers(0, 23, int(rng.integers(1, 60))).astype(np.int8)

    got_noadj = _kernel_scores(seqs, q, sm, og, eg, noadj=True)
    got_classic = _kernel_scores(seqs, q, sm, og, eg, noadj=False)
    order = np.argsort(lengths, kind="stable")   # sorted-id order
    want = np.array([sw_score_numpy(q, seqs[i], sm, og, eg)
                     for i in order])

    assert got_classic.tolist() == want.tolist(), (kind, og, eg)
    assert got_noadj.tolist() == want.tolist(), (kind, og, eg)


def test_noadj_exact_multichunk_boundary():
    """Chunk-carried colH/colE state with the relaxed update: subjects
    spanning several 128-column chunks, positive-heavy matrix, og=0 —
    the config where an F->E corner (the dropped path family) would be
    cheapest and a carry bug would surface at chunk boundaries."""
    rng = np.random.default_rng(7)
    sm = _inert_dummy(rng.integers(0, 16, size=(24, 24)))
    lens = (300, 517, 640, 129)
    seqs = [rng.integers(0, 23, l).astype(np.int8) for l in lens]
    order = np.argsort(lens, kind="stable")      # sorted-id order
    q = rng.integers(0, 23, 100).astype(np.int8)
    for og, eg in ((0, 1), (0, 0), (2, 1)):
        got = _kernel_scores(seqs, q, sm, og, eg, noadj=True)
        want = [sw_score_numpy(q, seqs[i], sm, og, eg) for i in order]
        assert got.tolist() == want, (og, eg)


class _FakeDB:
    def __init__(self, l_max):
        self.bin_lengths = [64, l_max]


def test_fp32_guard_demotes_exactly_at_limit():
    """resolve_exact_acc_dtype flips fp32 -> int32 exactly when
    (l_max + 1) * max(submat) reaches FP32_EXACT_LIMIT (2^24)."""
    cfg = SearchConfig(acc_dtype="float32")
    smax = 11                                   # blosum62 max entry
    sm = np.zeros((24, 24), np.int8)
    sm[0, 0] = smax
    # smallest l with (l+1)*smax >= limit, and the last l below it
    l_bad = -(-FP32_EXACT_LIMIT // smax) - 1
    l_ok = l_bad - 1
    assert (l_ok + 1) * smax < FP32_EXACT_LIMIT
    assert resolve_exact_acc_dtype(cfg, sm, _FakeDB(l_ok)) == jnp.float32
    assert (l_bad + 1) * smax >= FP32_EXACT_LIMIT
    assert resolve_exact_acc_dtype(cfg, sm, _FakeDB(l_bad)) == jnp.int32
    # int32 config never promotes
    cfg_i = SearchConfig(acc_dtype="int32")
    assert resolve_exact_acc_dtype(cfg_i, sm, _FakeDB(64)) == jnp.int32
    # non-positive matrices can never accumulate past the limit
    sm_neg = np.full((24, 24), -5, np.int8)
    assert resolve_exact_acc_dtype(
        cfg, sm_neg, _FakeDB(10**9)) == jnp.float32
