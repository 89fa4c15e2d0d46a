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
