"""Falsifiable multi-chip scaling model.

This rig has ONE physical chip: multi-chip correctness is proven on the
virtual 8-device mesh + 2-process Gloo CI, but multi-chip PERFORMANCE can
only be projected.  This module makes the projection falsifiable — it is
built from measured single-chip quantities plus the database's exact
shard geometry, prints every term, and states the numbers a first real
pod run must reproduce (or refute):

  T(N) = sum_b t_b * infl_b(N) / N          compute: per-bin single-chip
                                            time scaled by the group
                                            padding a N-way shard forces
       + t_overhead                         measured mesh=1 dispatch +
                                            shard_map + readback overhead
                                            (same dispatch count at any N)
       + (N-1)*hop + ag_bytes(N)/bw         ONE ring all-gather of the
                                            packed [2, k+2] int32
                                            candidates per search (the
                                            fused dispatch merges every
                                            bin's local top-k before the
                                            collective, dist/shard.py
                                            _fused_fn)

where infl_b(N) = ceil(G_b/N)*N / G_b (shard_groups pads each bin's group
count to a mesh multiple — the exact analog of the reference rounding its
chunk count to a device multiple, sequences.c:913-918), and ag_bytes(N)
= 8*(k+2)*(N-1) bytes cross each device's ICI links per search.

The model's N=1 prediction reproduces the measured mesh=1 time by
construction (that calibrates t_overhead); N in {8, 64, 256} are the
predictions to check the day hardware exists.  The reference's analog of
this machinery is its multi-FPGA round-robin scheduler
(/root/reference/host/src/FPGAsearch.c:132-239).
"""

import dataclasses

# v5e ICI: ~45 GB/s usable per direction per link on a ring; hop latency
# ~1 us.  Both are order-of-magnitude constants — at k=10 the payload is
# ~100 B/bin so the model is latency-dominated and insensitive to bw.
ICI_BYTES_PER_S = 45e9
ICI_HOP_S = 1e-6
GROUP_LANES = 1024


@dataclasses.dataclass
class BinRow:
    L: int                  # padded subject length of the bin
    groups: int             # group count (1024 seqs each)
    ag_bytes_per_dev: dict  # N -> all-gather bytes per device for this bin
    inflation: dict         # N -> shard-padding compute inflation


@dataclasses.dataclass
class Projection:
    n_bins: int
    dispatches: int         # programs per search (1: fused dispatch)
    t_single_s: float       # measured single-chip search seconds
    t_mesh1_s: float        # measured mesh=1 distributed search seconds
    overhead_s: float       # t_mesh1 - t_single (dispatch + shard_map)
    bins: list              # [BinRow]
    t_proj_s: dict          # N -> projected seconds
    efficiency: dict        # N -> (t_single/N) / t_proj
    gcups: dict             # N -> projected GCUPS (true cells)

    def rows(self):
        out = []
        for n, t in self.t_proj_s.items():
            out.append({"devices": n, "projected_s": round(t, 5),
                        "efficiency": round(self.efficiency[n], 3),
                        "projected_gcups": round(self.gcups[n], 1)})
        return out


def scaling_projection(db, k: int, qlen: int, t_single_s: float,
                       t_mesh1_s: float, n_list=(1, 8, 64, 256),
                       ici_bytes_per_s: float = ICI_BYTES_PER_S,
                       ici_hop_s: float = ICI_HOP_S) -> Projection:
    """Project distributed search time/efficiency at mesh sizes n_list
    from measured single-chip and mesh=1 times (see module docstring)."""
    geoms = [(L, int(db.bins[L]["seq"].shape[0])) for L in db.bin_lengths]
    total_padcells = sum(g * L for L, g in geoms) or 1
    overhead = max(t_mesh1_s - t_single_s, 0.0)
    payload = 8 * (k + 2)            # packed [2, k+2] int32 per shard
    bins, t_proj, eff, gc = [], {}, {}, {}
    rows = [BinRow(L=L, groups=g, ag_bytes_per_dev={}, inflation={})
            for L, g in geoms]
    for n in n_list:
        t_comp = 0.0
        ag = payload * (n - 1)
        for row, (L, g) in zip(rows, geoms):
            infl = (-(-g // n) * n) / g          # shard_groups padding
            row.inflation[n] = round(infl, 4)
            row.ag_bytes_per_dev[n] = ag
            t_b = t_single_s * (g * L) / total_padcells
            t_comp += t_b * infl / n
        # ONE collective per search (fused dispatch): a ring all-gather
        # of the shard-local candidate block
        t_ici = (n - 1) * ici_hop_s + ag / ici_bytes_per_s
        t = t_comp + overhead + t_ici
        t_proj[n] = t
        eff[n] = (t_single_s / n) / t if t > 0 else 0.0
        gc[n] = qlen * db.n_residues / t / 1e9 if t > 0 else 0.0
    return Projection(n_bins=len(geoms), dispatches=1,
                      t_single_s=t_single_s, t_mesh1_s=t_mesh1_s,
                      overhead_s=overhead, bins=rows, t_proj_s=t_proj,
                      efficiency=eff, gcups=gc)
