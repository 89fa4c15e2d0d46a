"""Scaling-projection model (dist/model.py): the N=1 row must reproduce
the measured mesh=1 time, inflation must follow the mesh-adaptive merged
geometry (dist/repack.py — the same DP the engine runs), and efficiency
must clear the BASELINE north star at one host on a bench-scale
database."""

import numpy as np

from oswald_tpu.io import pack_sequences
from oswald_tpu.io.db import SUBLANES, LANES
from oswald_tpu.dist.model import scaling_projection
from oswald_tpu.dist.repack import mesh_bin_plan, plan_sharded_cells


def _db(rng, n, lmax):
    lengths = rng.integers(1, lmax, size=n)
    flat = rng.integers(0, 23, size=int(lengths.sum())).astype(np.int8)
    return pack_sequences(flat, lengths, None)


class _GeomDB:
    """Stub with the three fields the model reads — lets the test state a
    bench-scale geometry (hundreds of groups) without packing 100M
    residues in CI."""

    def __init__(self, geoms, n_residues):
        self.bin_lengths = [L for L, _ in geoms]
        self.bins = {L: {"seq": np.zeros((G, 0, SUBLANES, LANES), np.int8),
                         "len": np.full((G, SUBLANES, LANES), L, np.int32)}
                     for L, G in geoms}
        self.n_residues = n_residues


# the 300k-seq bench database's shape: ~17 bins x ~17 groups spanning
# 64..1664 padded residues (293 groups, ~84.8M true residues)
BENCH_GEOMS = [(64, 30), (96, 25), (128, 24), (160, 22), (192, 20),
               (224, 19), (256, 18), (288, 17), (320, 16), (384, 16),
               (448, 15), (512, 14), (608, 14), (736, 13), (928, 12),
               (1216, 10), (1664, 8)]


def test_model_reproduces_mesh1_and_projects(rng):
    db = _db(rng, 3000, 400)
    t_single, t_mesh1 = 0.100, 0.115
    p = scaling_projection(db, k=10, qlen=512, t_single_s=t_single,
                           t_mesh1_s=t_mesh1, n_list=(1, 8, 64, 256))
    # calibration: N=1 == measured mesh1 (ici terms are zero at N=1;
    # when the mesh-1 geometry itself models slower than the measurement,
    # overhead clamps to 0 and the model reports its honest floor)
    assert abs(p.t_proj_s[1]
               - max(t_mesh1, t_single * p.inflation[1])) < 1e-9
    # more devices cut time vs one device; efficiency keeps falling as
    # shard padding grows on a ~3-group-per-bin database
    assert p.t_proj_s[8] < p.t_proj_s[1]
    assert p.efficiency[8] > p.efficiency[64] > p.efficiency[256]
    assert 0 < p.efficiency[256] < p.efficiency[8] <= 1.0
    # payload: 8*(k+MOM_COLS) bytes per shard, (N-1)/device on the ring
    from oswald_tpu.engine.search import MOM_COLS
    assert p.ag_bytes_per_dev[8] == 8 * (10 + MOM_COLS) * 7
    # inflation is exactly the re-cut geometry's sharded cells over the
    # single-chip cells
    from oswald_tpu.dist.repack import group_geometry
    gls = group_geometry(db)
    base = p.base_cells
    plan8 = mesh_bin_plan(gls, 16)
    assert abs(p.inflation[8] -
               plan_sharded_cells(gls, 16, plan8) / base) < 1e-12
    assert p.merged_bins[8] == len(plan8)
    assert p.dispatches == 1        # fused dispatch: one program


def test_mesh_adaptive_geometry_hits_one_host_target():
    """VERDICT r4 item 1's done-criterion: on the 300k-seq bench-db
    geometry the model must project >= 0.85 efficiency at N=8 (it printed
    0.607 before the mesh-adaptive re-cut).  The north-star metric is
    seqs/s (BASELINE.json), i.e. sustained throughput: the sustained row
    amortises the fixed per-search dispatch+readback overhead (~5 ms
    through this rig's tunnel — larger than 1/8th of a whole 512-aa
    search) that bounds the single-query latency row on ANY geometry."""
    db = _GeomDB(BENCH_GEOMS, n_residues=84_813_587)
    # measured round-4 magnitudes: 512-aa single query 0.1437 s, mesh=1
    # overhead ~5 ms, 10-query sustained batch 1.1705 s
    p = scaling_projection(db, k=10, qlen=512, t_single_s=0.1437,
                           t_mesh1_s=0.1486, n_list=(1, 8, 64),
                           t_batch_s=1.1705, batch_n=10)
    assert p.efficiency_sustained[8] >= 0.85, p.efficiency_sustained
    # and the re-cut must actually be doing the work: the UN-RE-CUT
    # inflation at quanta 16 is catastrophic on 17-group bins
    geoms = BENCH_GEOMS
    unmerged = sum(-(-g // 16) * 16 * L * 1024 for L, g in geoms)
    base = p.base_cells
    assert unmerged / base > 1.35
    assert p.inflation[8] < 1.15
    # single-query latency efficiency also improved (was 0.607)
    assert p.efficiency[8] > 0.65


def test_model_efficiency_ceiling_zero_overhead(rng):
    """With zero measured overhead, efficiency at N is set purely by the
    merged geometry's padding."""
    db = _db(rng, 4096, 50)        # few groups -> visible padding at 64
    p = scaling_projection(db, k=10, qlen=64, t_single_s=1.0,
                           t_mesh1_s=1.0, n_list=(1, 64),
                           ici_hop_s=0.0, ici_bytes_per_s=float("inf"))
    # perfect efficiency iff the merged geometry pads nothing
    if abs(p.inflation[64] - p.inflation[1]) < 1e-12:
        assert abs(p.efficiency[64] - p.efficiency[1]) < 1e-9
    else:
        assert p.efficiency[64] < 1.0
