"""Empirical E-value / bit-score statistics (beyond the reference).

The reference reports raw Smith-Waterman scores only
(/root/reference/host/src/FPGAsearch.c:306-321); real search tools
(SSEARCH, BLAST) report the statistical significance of each hit.  Gapped
alignment scores have no analytic Karlin-Altschul parameters, so we do what
SSEARCH does: fit an extreme-value (Gumbel) distribution to the observed
score distribution of THIS query against THIS database — which the engine
has already computed for every sequence — and derive E-values from the fit.

TPU-native twist: the fit needs only the count and the first two moments of
the scores, so the device piggybacks sum(S) and sum(S^2) (float32) onto the
packed top-k readback (engine/search.py:_topk) and the full score vector
never crosses the host boundary.  The k reported hits are excluded from the
fit host-side (their exact values are in the same packed array), so a few
strong true positives cannot inflate the null variance.

Method-of-moments Gumbel fit: for S ~ Gumbel(mu, 1/lambda),
  E[S] = mu + gamma/lambda,  Var[S] = pi^2 / (6 lambda^2)
=>  lambda = pi / sqrt(6 Var),  mu = mean - gamma/lambda.
E-value of score s over a database of N sequences:
  E = N * P(S >= s) = N * (1 - exp(-exp(-lambda (s - mu)))).
Known simplification vs SSEARCH: no regression of score on ln(subject
length) — the fit pools all lengths, which widens the variance and makes
the E-values conservative for short subjects.  Bit scores use the
Karlin-Altschul identification K*m*n = exp(lambda*mu):
  S_bits = (lambda s - ln K) / ln 2.
"""

import dataclasses
import math

import numpy as np

_GAMMA = 0.5772156649015329          # Euler-Mascheroni
_MIN_FIT_N = 50                      # fewer sequences: no meaningful fit


@dataclasses.dataclass
class ScoreStats:
    """Fitted null-score model for one (query, database) search."""
    n_fit: int          # sequences in the fit (top-k hits excluded)
    mean: float
    var: float
    lam: float          # Gumbel rate (lambda)
    mu: float           # Gumbel location

    def tail_p(self, scores) -> np.ndarray:
        """Per-sequence P(S >= s) under the fitted null."""
        s = np.asarray(scores, np.float64)
        return -np.expm1(-np.exp(-self.lam * (s - self.mu)))

    def evalues(self, scores, n_db: int) -> np.ndarray:
        """Expected chance hits >= s in a database of n_db sequences."""
        return n_db * self.tail_p(scores)

    def bit_scores(self, scores, m: int, n_avg: float) -> np.ndarray:
        """Normalised (bit) scores via K*m*n_avg = exp(lambda*mu):
        bits = (lambda*s - ln K) / ln 2 where m = query length and n_avg =
        mean database sequence length."""
        s = np.asarray(scores, np.float64)
        ln_k = self.lam * self.mu - math.log(max(m, 1) * max(n_avg, 1.0))
        return (self.lam * s - ln_k) / math.log(2.0)


def fit_gumbel(n_valid: int, score_sum: float, score_sumsq: float,
               exclude_scores=None) -> ScoreStats | None:
    """Method-of-moments Gumbel fit from streaming moments.

    n_valid / score_sum / score_sumsq: count and moments over every real
    (non-padding) database sequence's score.  exclude_scores: the reported
    top-k hit scores, removed from the moments so true positives do not
    contaminate the null fit.  Returns None when too few sequences remain
    or the variance is degenerate (constant scores).
    """
    n = int(n_valid)
    s1 = float(score_sum)
    s2 = float(score_sumsq)
    if exclude_scores is not None and len(exclude_scores):
        ex = np.asarray(exclude_scores, np.float64)
        n -= ex.size
        s1 -= float(ex.sum())
        s2 -= float((ex * ex).sum())
    if n < _MIN_FIT_N:
        return None
    mean = s1 / n
    var = max(s2 / n - mean * mean, 0.0)
    if var <= 0.0:
        return None
    lam = math.pi / math.sqrt(6.0 * var)
    mu = mean - _GAMMA / lam
    return ScoreStats(n_fit=n, mean=mean, var=var, lam=lam, mu=mu)


def format_evalue(e: float) -> str:
    """BLAST-style compact E-value rendering."""
    if e != e:                                   # NaN
        return "n/a"
    if e >= 10:
        return f"{e:.0f}"
    if e >= 0.1:
        return f"{e:.2f}"
    return f"{e:.1e}"
