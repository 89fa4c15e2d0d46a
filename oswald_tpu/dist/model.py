"""Falsifiable multi-chip scaling model.

This rig has ONE physical chip: multi-chip correctness is proven on the
virtual 8-device mesh + 2-process Gloo CI, but multi-chip PERFORMANCE can
only be projected.  This module makes the projection falsifiable — it is
built from measured single-chip quantities plus the database's exact
shard geometry, prints every term, and states the numbers a first real
pod run must reproduce (or refute):

  T(N) = t_single * cells(N) / cells(1chip) / N     compute
       + t_overhead                                 measured mesh=1
                                                    dispatch + shard_map
                                                    + readback overhead
       + (N-1)*hop + ag_bytes(N)/bw                 ONE ring all-gather of
                                                    the packed [2, k+2]
                                                    int32 candidates per
                                                    search (fused
                                                    dispatch, dist/
                                                    shard.py _fused_fn)

cells(N) is the padded lane-residue count of the MESH-ADAPTIVE bin
geometry the engine actually builds at mesh size N (dist/repack.py:
bins merged by the same DP the engine runs, then group counts rounded
up to N*group_block) — so shard-padding inflation AND the length padding
the merge trades it for both appear in the projection.  cells(1chip) is
the single-chip engine's geometry (groups rounded to group_block only),
the geometry t_single was measured on.  The reference's analog of the
geometry adaptation is its chunk-size-to-device-count rounding
(/root/reference/host/src/sequences.c:913-918).

The model's N=1 prediction reproduces the measured mesh=1 time by
construction (that calibrates t_overhead); N in {8, 64, 256} are the
predictions to check the day hardware exists.
"""

import dataclasses

from oswald_tpu.dist.repack import (mesh_bin_plan, plan_sharded_cells,
                                    group_geometry)
from oswald_tpu.io.db import GROUP_LANES

# v5e ICI: ~45 GB/s usable per direction per link on a ring; hop latency
# ~1 us.  Both are order-of-magnitude constants — at k=10 the payload is
# ~100 B/shard so the model is latency-dominated and insensitive to bw.
ICI_BYTES_PER_S = 45e9
ICI_HOP_S = 1e-6


def _round_up(x: int, q: int) -> int:
    return -(-x // q) * q


@dataclasses.dataclass
class Projection:
    n_bins: int             # bins in the single-chip geometry
    dispatches: int         # programs per search (1: fused dispatch)
    t_single_s: float       # measured single-chip search seconds
    t_mesh1_s: float        # measured mesh=1 distributed search seconds
    overhead_s: float       # t_mesh1 - modelled N=1 compute
    base_cells: int         # single-chip padded lane-residues
    merged_bins: dict       # N -> bin count after the mesh-adaptive merge
    inflation: dict         # N -> cells(N) / base_cells (>= 1)
    ag_bytes_per_dev: dict  # N -> all-gather bytes per device per search
    t_proj_s: dict          # N -> projected seconds (single query)
    efficiency: dict        # N -> (t_single/N) / t_proj  (latency)
    gcups: dict             # N -> projected GCUPS (true cells)
    # sustained stream (the BASELINE north star is seqs/s, a THROUGHPUT
    # metric: per-search dispatch/readback overhead amortises over the
    # batch, so this is the efficiency a pod serving real load sees);
    # empty when no batch measurement was supplied
    batch_n: int = 0
    t_batch_s: float = 0.0
    efficiency_sustained: dict = dataclasses.field(default_factory=dict)
    gcups_sustained: dict = dataclasses.field(default_factory=dict)

    def rows(self):
        out = []
        for n, t in self.t_proj_s.items():
            row = {"devices": n, "projected_s": round(t, 5),
                   "efficiency": round(self.efficiency[n], 3),
                   "projected_gcups": round(self.gcups[n], 1),
                   "merged_bins": self.merged_bins[n],
                   "inflation": round(self.inflation[n], 4)}
            if n in self.efficiency_sustained:
                row["efficiency_sustained"] = \
                    round(self.efficiency_sustained[n], 3)
                row["gcups_sustained"] = round(self.gcups_sustained[n], 1)
            out.append(row)
        return out


def scaling_projection(db, k: int, qlen: int, t_single_s: float,
                       t_mesh1_s: float, n_list=(1, 8, 64, 256),
                       group_block: int = 2,
                       t_batch_s: float = 0.0, batch_n: int = 0,
                       ici_bytes_per_s: float = ICI_BYTES_PER_S,
                       ici_hop_s: float = ICI_HOP_S) -> Projection:
    """Project distributed search time/efficiency at mesh sizes n_list
    from measured single-chip and mesh=1 times (see module docstring).
    t_batch_s/batch_n: optional measured single-chip wall time of a
    batch_n-query sustained batch (same qlen) — adds the sustained-
    throughput efficiency rows, where the per-search overhead is paid
    once per batch instead of once per query."""
    geoms = [(L, int(db.bins[L]["seq"].shape[0])) for L in db.bin_lengths]
    # the geometry t_single was measured on: groups padded to group_block
    base = sum(_round_up(g, group_block) * L * GROUP_LANES
               for L, g in geoms) or 1
    from oswald_tpu.engine.search import MOM_COLS
    payload = 8 * (k + MOM_COLS)     # packed [2, k+MOM_COLS] int32/shard
    group_Ls = group_geometry(db)    # group-granular re-cut geometry

    def cells(n):
        quanta = n * group_block
        plan = mesh_bin_plan(group_Ls, quanta)
        return plan_sharded_cells(group_Ls, quanta, plan), len(plan)

    cells1, _ = cells(1)
    # calibration: overhead is whatever the measured mesh=1 time carries
    # beyond the modelled N=1 compute, so t_proj[1] == t_mesh1 exactly
    overhead = max(t_mesh1_s - t_single_s * cells1 / base, 0.0)
    merged_bins, inflation, ag_b, t_proj, eff, gc = {}, {}, {}, {}, {}, {}
    eff_sus, gc_sus = {}, {}
    for n in n_list:
        c_n, nb = cells(n)
        merged_bins[n] = nb
        inflation[n] = c_n / base
        ag = payload * (n - 1)
        ag_b[n] = ag
        t_comp = t_single_s * (c_n / base) / n
        # ONE collective per search (fused dispatch): a ring all-gather
        # of the shard-local candidate block
        t_ici = (n - 1) * ici_hop_s + ag / ici_bytes_per_s
        t = t_comp + overhead + t_ici
        t_proj[n] = t
        eff[n] = (t_single_s / n) / t if t > 0 else 0.0
        gc[n] = qlen * db.n_residues / t / 1e9 if t > 0 else 0.0
        if t_batch_s and batch_n:
            # sustained: the whole batch pays ONE dispatch-round overhead
            # and batch_n collectives; compute scales by the same cells
            tb = t_batch_s * (c_n / base) / n + overhead + batch_n * t_ici
            eff_sus[n] = (t_batch_s / n) / tb if tb > 0 else 0.0
            gc_sus[n] = batch_n * qlen * db.n_residues / tb / 1e9 \
                if tb > 0 else 0.0
    return Projection(n_bins=len(geoms), dispatches=1,
                      t_single_s=t_single_s, t_mesh1_s=t_mesh1_s,
                      overhead_s=overhead, base_cells=base,
                      merged_bins=merged_bins, inflation=inflation,
                      ag_bytes_per_dev=ag_b, t_proj_s=t_proj,
                      efficiency=eff, gcups=gc,
                      batch_n=batch_n, t_batch_s=t_batch_s,
                      efficiency_sustained=eff_sus,
                      gcups_sustained=gc_sus)
