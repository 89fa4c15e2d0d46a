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
