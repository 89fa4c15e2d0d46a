"""Worker process for the real multi-process distributed test.

Launched by tests/test_multiprocess.py: two OS processes, each a CPU
backend with 4 virtual devices, form one 8-device mesh via
jax.distributed (Gloo collectives over localhost).  Exercises the code
paths a single process never runs: process_group_slice with a non-trivial
process split and jax.make_array_from_process_local_data assembly.

argv: <coordinator_port> <rank> <out_json_path>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    port, rank, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from oswald_tpu.dist import bootstrap
    pid, count = bootstrap(f"localhost:{port}", 2, rank)
    assert (pid, count) == (rank, 2), (pid, count)
    assert jax.process_index() == rank
    assert jax.local_device_count() == 4 and jax.device_count() == 8
    # idempotent second call
    assert bootstrap() == (rank, 2)

    from oswald_tpu.io import pack_sequences
    from oswald_tpu.engine import SearchConfig
    from oswald_tpu.dist import DistributedSearchEngine, make_device_mesh

    # both ranks derive the identical database from the seed (in a real
    # deployment both read the same .oswt; each loads only its mmap slice)
    rng = np.random.default_rng(42)
    n = 700
    lengths = rng.integers(1, 120, size=n)
    flat = rng.integers(0, 20, size=int(lengths.sum())).astype(np.int8)
    db = pack_sequences(flat, lengths, [f"s{i}" for i in range(n)])

    mesh = make_device_mesh()           # all 8 global devices
    eng = DistributedSearchEngine(db, SearchConfig(top=12), mesh=mesh)
    q1 = rng.integers(0, 20, size=33).astype(np.int8)
    q2 = rng.integers(0, 20, size=57).astype(np.int8)
    r1 = eng.search(q1)
    rb = eng.search_many([q1, q2], batch=True)
    assert np.array_equal(rb[0].scores, r1.scores), (rb[0].scores, r1.scores)

    # fused dispatch under process_count == 2: one shard_map program +
    # one collective per search (dist/shard.py _fused_fn) must produce
    # identical results with REAL cross-process Gloo collectives — this
    # is the pod-serving dispatch shape (auto keeps per-bin in interpret
    # mode, so force it here)
    e_fused = DistributedSearchEngine(
        db, SearchConfig(top=12, fused_dispatch=True), mesh=mesh)
    for q, ref in ((q1, r1), (q2, rb[1])):
        r = e_fused.search(q)
        assert np.array_equal(r.scores, ref.scores), (r.scores, ref.scores)
        assert np.array_equal(np.asarray(r.seq_ids),
                              np.asarray(ref.seq_ids))
    del e_fused

    # stream under process_count == 2 (same db, same expected results)
    e_stream = DistributedSearchEngine(
        db, SearchConfig(top=12, profile_mode="stream"), mesh=mesh)
    for q, ref in ((q1, r1), (q2, rb[1])):
        r = e_stream.search(q)
        assert np.array_equal(r.scores, ref.scores), (r.scores, ref.scores)
        assert np.array_equal(np.asarray(r.seq_ids),
                              np.asarray(ref.seq_ids))
    rb2 = e_stream.search_many([q1, q2], batch=True)
    assert np.array_equal(rb2[1].scores, rb[1].scores)
    del e_stream

    # host_stream under process_count == 2: executes the per-process
    # slice math (dist/shard.py _hs_transfer / process_group_slice on
    # streamed slices) that a single-process mesh never touches
    # (VERDICT r2 item 8).  Needs a bin wider than one slice quantum, so
    # a separate many-short-sequences db (16 groups/slice at 1 MiB).
    rng2 = np.random.default_rng(1234)
    n2 = 20000
    # lengths 33..59: every group max rounds up to ONE 64-residue bin
    # (with the 32-residue LENGTH_QUANTUM a 1..60 spread splits into a
    # 32- and a 64-bin whose per-bin group counts fit a single slice
    # each, defeating the multiple-slices-per-bin requirement below)
    lengths2 = rng2.integers(33, 60, size=n2)
    flat2 = rng2.integers(0, 20, size=int(lengths2.sum())).astype(np.int8)
    db2 = pack_sequences(flat2, lengths2, [f"t{i}" for i in range(n2)])
    e_hs = DistributedSearchEngine(
        db2, SearchConfig(top=12, profile_mode="host_stream",
                          host_stream_slice_mb=1), mesh=mesh)
    assert len(e_hs._hs_slices) > len(db2.bin_lengths), \
        "host_stream test should stream multiple slices per bin"
    e_ref = DistributedSearchEngine(
        db2, SearchConfig(top=12, profile_mode="precompute"), mesh=mesh)
    for q in (q1, q2):
        r_hs, r_ref = e_hs.search(q), e_ref.search(q)
        assert np.array_equal(r_hs.scores, r_ref.scores), \
            (r_hs.scores, r_ref.scores)
        assert np.array_equal(np.asarray(r_hs.seq_ids),
                              np.asarray(r_ref.seq_ids))

    # pod-serving broadcast protocol (serve._serve_forever_pod's core):
    # rank 0 dispatches through the broadcast proxy, rank 1 mirrors in
    # pod_worker_loop — the SPMD programs must line up and the results
    # must equal the direct mesh results computed above
    from oswald_tpu.serve import (_PodBroadcastEngine, pod_worker_loop,
                                  pod_shutdown_broadcast)
    if rank == 0:
        proxy = _PodBroadcastEngine(eng)
        rp = proxy.search_many([q1, q2], batch=True)
        assert np.array_equal(rp[0].scores, r1.scores), "pod q1"
        assert np.array_equal(rp[1].scores, rb[1].scores), "pod q2"
        rs = proxy.search_many([q2], batch=True)     # second dispatch
        assert np.array_equal(rs[0].scores, rb[1].scores), "pod q2 solo"
        pod_shutdown_broadcast()
    else:
        served = pod_worker_loop(eng)
        assert served == 3, served

    with open(out_path, "w") as f:
        json.dump({
            "rank": rank,
            "q1_scores": r1.scores.tolist(),
            "q1_ids": np.asarray(r1.seq_ids).tolist(),
            "q2_scores": rb[1].scores.tolist(),
            "q2_ids": np.asarray(rb[1].seq_ids).tolist(),
        }, f)
    print(f"rank {rank} done", flush=True)


if __name__ == "__main__":
    main()
