"""Significance statistics: Gumbel fit recovery, device-moment parity,
planted-hit discrimination, engine-path coverage (single/batch/dist/
host_stream)."""

import numpy as np
import pytest

from oswald_tpu.stats import fit_gumbel, fit_score_model, format_evalue
from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig

from conftest import random_protein


def _db(rng, n, lmax=200, planted=None):
    lengths = rng.integers(20, lmax, size=n)
    seqs = [random_protein(rng, int(l)) for l in lengths]
    if planted is not None:
        seqs[0] = planted
        lengths[0] = len(planted)
    return (pack_sequences(np.concatenate(seqs), lengths,
                           [f"t{i}" for i in range(n)]), seqs, lengths)


def test_fit_gumbel_parameter_recovery(rng):
    """Method-of-moments fit recovers known Gumbel parameters."""
    lam, mu = 0.3, 25.0
    x = mu - np.log(-np.log(rng.uniform(size=200_000))) / lam
    st = fit_gumbel(x.size, x.sum(), (x * x).sum())
    assert abs(st.lam - lam) / lam < 0.02
    assert abs(st.mu - mu) < 0.2
    # tail calibration: empirical P(X >= q99.9) ~ fitted tail_p
    q = np.quantile(x, 0.999)
    assert 0.5e-3 < st.tail_p(q) < 2e-3


def test_fit_gumbel_guards(rng):
    assert fit_gumbel(10, 100.0, 2000.0) is None          # too few
    assert fit_gumbel(1000, 5000.0, 25000.0) is None      # zero variance
    x = rng.normal(20.0, 3.0, size=1000)
    st = fit_gumbel(x.size, x.sum(), (x * x).sum(),
                    exclude_scores=x[:5])
    want = fit_gumbel(995, x[5:].sum(), (x[5:] ** 2).sum())
    assert st.n_fit == 995
    np.testing.assert_allclose(st.lam, want.lam, rtol=1e-9)
    np.testing.assert_allclose(st.mu, want.mu, rtol=1e-9)


def test_format_evalue():
    assert format_evalue(123.4) == "123"
    assert format_evalue(0.23) == "0.23"
    assert format_evalue(3.2e-8) == "3.2e-08"
    assert format_evalue(float("nan")) == "n/a"


def test_fit_score_model_slope_recovery(rng):
    """The length regression recovers a planted score-vs-lnL trend and the
    residual Gumbel scale."""
    n = 100_000
    lnl = np.log(rng.integers(30, 3000, size=n).astype(np.float64))
    a, b, lam = 12.0, 6.0, 0.35
    g = -np.log(-np.log(rng.uniform(size=n))) / lam - 0.5772156649 / lam
    s = a + b * lnl + g
    st = fit_score_model(n, s.sum(), (s * s).sum(), (s * lnl).sum(),
                         lnl.sum(), (lnl * lnl).sum())
    assert abs(st.b - b) < 0.1
    assert abs(st.a - a) < 0.5
    assert abs(st.lam - lam) / lam < 0.02
    # degenerate: single distinct length -> slope 0, pooled fit
    l0 = np.full(n, np.log(100.0))
    st0 = fit_score_model(n, s.sum(), (s * s).sum(), (s * l0).sum(),
                          l0.sum(), (l0 * l0).sum())
    assert st0.b == 0.0 and st0.var > 0


def test_engine_stats_match_host_fit(rng):
    """The device-side packed moments reproduce a fully host-computed fit
    over score_all (f32 summation tolerance), including the lnL moment."""
    db, seqs, lengths = _db(rng, 300)
    eng = SearchEngine(db, SearchConfig(top=5))
    q = random_protein(rng, 80)
    res = eng.search(q)
    flat = np.asarray(eng.score_all(q))
    valid = eng.ids_flat >= 0
    sf = flat[valid].astype(np.float64)
    lnl = eng.lnl_flat[valid].astype(np.float64)
    ids = eng.ids_flat[valid]
    top_lnl = eng._lnl_by_id[np.asarray(res.seq_ids)]
    want = fit_score_model(
        db.n_seqs, sf.sum(), (sf * sf).sum(), (sf * lnl).sum(),
        lnl.sum(), (lnl * lnl).sum(),
        exclude_scores=res.scores, exclude_lnl=top_lnl)
    np.testing.assert_allclose(res.stats.lam, want.lam, rtol=1e-4)
    np.testing.assert_allclose(res.stats.b, want.b, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(res.stats.mu, want.mu, rtol=1e-4)


def test_planted_hit_significance(rng):
    """A planted identical sequence must get a tiny E-value; the best
    random hit must look like chance (E not ridiculously small)."""
    q = random_protein(rng, 150)
    db, seqs, lengths = _db(rng, 800, planted=q.copy())
    eng = SearchEngine(db, SearchConfig(top=5))
    res = eng.search(q)
    assert res.titles[0] == "t0"
    assert res.evalues is not None
    assert res.evalues[0] < 1e-6
    assert res.bit_scores[0] > res.bit_scores[1] + 10
    # second-best is a chance hit drawn from ~800 tries: E in sane range
    assert res.evalues[1] > 1e-3
    # E-values ascend as scores descend
    assert np.all(np.diff(res.evalues) >= 0)


def test_small_db_has_no_stats(rng):
    db, _, _ = _db(rng, 30)
    eng = SearchEngine(db, SearchConfig(top=5))
    res = eng.search(random_protein(rng, 40))
    assert res.stats is None and res.evalues is None


def test_batch_and_nonbatch_stats_agree(rng):
    db, _, _ = _db(rng, 400)
    eng = SearchEngine(db, SearchConfig(top=4))
    qs = [random_protein(rng, 60), random_protein(rng, 61),
          random_protein(rng, 130)]
    rb = eng.search_many(qs, batch=True)
    rs = [eng.search(q) for q in qs]
    for a, b in zip(rb, rs):
        np.testing.assert_allclose(a.evalues, b.evalues, rtol=1e-4)
        np.testing.assert_allclose(a.bit_scores, b.bit_scores, rtol=1e-4)


def test_host_stream_stats_match_precompute(rng):
    db, _, _ = _db(rng, 400)
    q = random_protein(rng, 70)
    base = SearchEngine(db, SearchConfig(top=4)).search(q)
    hs = SearchEngine(db, SearchConfig(
        top=4, profile_mode="host_stream")).search(q)
    assert hs.stats is not None
    np.testing.assert_allclose(hs.stats.lam, base.stats.lam, rtol=1e-4)
    np.testing.assert_allclose(hs.evalues, base.evalues, rtol=1e-3)


def test_dist_stats_match_single(rng):
    from oswald_tpu.dist import DistributedSearchEngine, make_device_mesh
    db, _, _ = _db(rng, 400)
    q = random_protein(rng, 70)
    cfg = SearchConfig(top=4)
    single = SearchEngine(db, cfg).search(q)
    deng = DistributedSearchEngine(db, cfg, mesh=make_device_mesh(8))
    dist = deng.search(q)
    assert dist.stats is not None
    np.testing.assert_allclose(dist.stats.lam, single.stats.lam, rtol=1e-4)
    np.testing.assert_allclose(dist.evalues, single.evalues, rtol=1e-3)
    # batched dist path too
    rb = deng.search_many([q, random_protein(rng, 75)], batch=True)
    np.testing.assert_allclose(rb[0].evalues, single.evalues, rtol=1e-3)


def test_histogram_report(rng):
    """Histogram buckets cover every sequence and the expected counts
    under the fitted null roughly track the observed null distribution."""
    from oswald_tpu.stats import histogram_report
    db, _, _ = _db(rng, 600)
    eng = SearchEngine(db, SearchConfig(top=5))
    q = random_protein(rng, 90)
    res = eng.search(q)
    flat = np.asarray(eng.score_all(q))[eng.ids_flat >= 0]
    txt = histogram_report(flat, res.stats, eng._len_hist)
    assert "score  obs" in txt and "*" in txt
    # every sequence counted
    assert f"obs {db.n_seqs} seqs" in txt
    # the fitted expectation integrates to ~n over the support
    import re
    m = re.search(r"exp sums to (\d+)", txt)
    assert m and abs(int(m.group(1)) - db.n_seqs) / db.n_seqs < 0.25


def test_cli_histogram(tmp_path, rng, capsys):
    from oswald_tpu.alphabet import ALPHABET
    from oswald_tpu.cli import main
    seqs = [random_protein(rng, int(l))
            for l in rng.integers(30, 150, size=120)]
    with open(tmp_path / "db.fasta", "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n" + "".join(ALPHABET[c] for c in s) + "\n")
    with open(tmp_path / "q.fasta", "w") as f:
        f.write(">hq\n" + "".join(ALPHABET[c] for c in seqs[3][:40]) + "\n")
    assert main(["preprocess", "-i", str(tmp_path / "db.fasta"),
                 "-o", str(tmp_path / "db")]) == 0
    assert main(["search", "-q", str(tmp_path / "q.fasta"),
                 "-d", str(tmp_path / "db"), "-r", "3", "-H",
                 "--devices", "1"]) == 0
    out = capsys.readouterr().out
    assert "score  obs" in out and "obs 120 seqs" in out


def test_tail_calibrate_fallbacks_and_clamp():
    """tail_calibrate contract: sentinel/small-db/thin-tail inputs return
    the MoM fit unchanged; extreme count ratios clamp lambda to within
    1.5x of the MoM value; a clean calibration anchors E(T1) to the
    observed count."""
    from oswald_tpu.stats import tail_calibrate, ScoreStats
    st = ScoreStats(n_fit=5000, mean=20.0, var=13.0, lam=0.35,
                    a=7.0, b=3.6, mu=18.35)
    hist = (np.array([200]), np.array([5000]))
    # sentinel
    assert tail_calibrate(st, 5000, hist, -1.0, -1.0, 0, 0) is st
    # small database floor
    small = ScoreStats(n_fit=700, mean=20.0, var=13.0, lam=0.35,
                       a=7.0, b=3.6, mu=18.35)
    assert tail_calibrate(small, 700, hist, 25.0, 30.0, 70, 20) is small
    # thin tail
    assert tail_calibrate(st, 5000, hist, 25.0, 30.0, 500, 5) is st
    # degenerate spread
    assert tail_calibrate(st, 5000, hist, 29.0, 30.0, 500, 50) is st
    # extreme ratio: ln(5000/16)/10 = 0.575 > 0.35*1.5 -> clamps
    out = tail_calibrate(st, 5000, hist, 25.0, 35.0, 5000, 16)
    assert out is not st
    assert abs(out.lam - 0.35 * 1.5) < 1e-9
    # clean calibration: anchored E(T1) equals the observed chance count
    out2 = tail_calibrate(st, 5000, hist, 25.0, 35.0, 500, 50)
    assert out2 is not st and out2.lam != st.lam
    e_t1 = float(out2.evalues(np.array([35.0]), 5000, hist)[0])
    np.testing.assert_allclose(e_t1, 50.0, rtol=1e-6)
    # E-values remain monotone nonincreasing in score
    ev = out2.evalues(np.array([30.0, 35.0, 40.0, 50.0]), 5000, hist)
    assert np.all(np.diff(ev) <= 0)
