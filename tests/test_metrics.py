"""Metrics subsystem + engine integration."""

import time

import numpy as np

from oswald_tpu.utils import Metrics, gcups
from oswald_tpu.io import pack_sequences
from oswald_tpu.engine import SearchEngine, SearchConfig
from oswald_tpu.dist import process_group_slice, make_device_mesh

from conftest import random_protein


def test_metrics_phases():
    m = Metrics()
    with m.phase("a"):
        time.sleep(0.01)
    m.add("a", 0.5)
    assert m.count("a") == 2 and m.total("a") > 0.5
    assert "a:" in m.report()
    assert m.as_dict()["a"]["count"] == 2


def test_gcups():
    assert gcups(100, 1_000_000, 0.1) == 1.0
    assert gcups(1, 1, 0) == float("inf")


def test_engine_records_metrics(rng):
    lengths = rng.integers(5, 60, size=200)
    flat = np.concatenate([random_protein(rng, int(l)) for l in lengths])
    db = pack_sequences(flat, lengths, None)
    eng = SearchEngine(db, SearchConfig(top=3))
    eng.search(random_protein(rng, 20))
    eng.search(random_protein(rng, 25))
    assert eng.metrics.count("engine_setup") == 1
    assert eng.metrics.count("search") == 2


def test_process_group_slice_single_process():
    mesh = make_device_mesh(8)
    lo, hi = process_group_slice(16, mesh)
    assert (lo, hi) == (0, 16)   # single process owns everything


def test_profile_trace_writes(tmp_path):
    import jax.numpy as jnp
    from oswald_tpu.utils import profile_trace
    with profile_trace(str(tmp_path)):
        jnp.arange(8).sum().block_until_ready()
    import os
    found = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert found, "profiler wrote no trace files"
