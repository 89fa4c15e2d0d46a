"""Scaling-projection model (dist/model.py): the N=1 row must reproduce
the measured mesh=1 time, inflation must be the exact shard_groups
padding, and efficiency must degrade monotonically in overhead."""

import numpy as np

from oswald_tpu.io import pack_sequences
from oswald_tpu.dist.model import scaling_projection


def _db(rng, n, lmax):
    lengths = rng.integers(1, lmax, size=n)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    return pack_sequences(flat, lengths, None)


def test_model_reproduces_mesh1_and_projects(rng):
    db = _db(rng, 3000, 400)
    t_single, t_mesh1 = 0.100, 0.115
    p = scaling_projection(db, k=10, qlen=512, t_single_s=t_single,
                           t_mesh1_s=t_mesh1, n_list=(1, 8, 64, 256))
    # calibration: N=1 == measured mesh1 (ici terms are zero at N=1)
    assert abs(p.t_proj_s[1] - t_mesh1) < 1e-9
    assert abs(p.overhead_s - 0.015) < 1e-9
    # more devices cut time vs one device, but on a ~3-group-per-bin
    # database the model correctly REFUSES to promise scaling past the
    # group count (shard padding: ceil(G/N)*N/G inflation) — time
    # saturates while efficiency keeps falling
    assert p.t_proj_s[8] < p.t_proj_s[1]
    assert p.efficiency[8] > p.efficiency[64] > p.efficiency[256]
    assert 0 < p.efficiency[256] < p.efficiency[8] <= 1.0
    # payload: 8*(k+2) bytes per shard, (N-1) per device on the ring
    for row in p.bins:
        assert row.ag_bytes_per_dev[8] == 8 * 12 * 7
        # inflation is exactly ceil(G/N)*N/G
        g = row.groups
        assert row.inflation[8] == round((-(-g // 8) * 8) / g, 4)
    assert p.dispatches == 1        # fused dispatch: one program


def test_model_efficiency_ceiling_zero_overhead(rng):
    """With zero measured overhead and one giant bin, efficiency at N is
    set purely by shard padding."""
    db = _db(rng, 4096, 50)        # few groups -> visible padding at 64
    p = scaling_projection(db, k=10, qlen=64, t_single_s=1.0,
                           t_mesh1_s=1.0, n_list=(1, 64),
                           ici_hop_s=0.0, ici_bytes_per_s=float("inf"))
    groups = [r.groups for r in p.bins]
    # perfect efficiency iff every bin's G divides 64
    if all(g % 64 == 0 for g in groups):
        assert abs(p.efficiency[64] - 1.0) < 1e-9
    else:
        assert p.efficiency[64] < 1.0
