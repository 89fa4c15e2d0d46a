"""Alignment traceback for reported hits (a capability the reference lacks).

The reference is score-only end to end (its report prints score + title,
/root/reference/host/src/FPGAsearch.c:306-321); a user switching from
SSEARCH/BLAST-style tools expects to *see* the top alignments.  oswald-tpu
adds traceback as a host-side post-pass over the k reported hits only — the
TPU scores all D sequences, the host aligns the handful that get printed, so
the O(m*n) traceback matrices exist for <= k small problems and the device
hot path is untouched.

The DP is the exact affine-gap Gotoh recurrence the kernel implements
(kernels/sw_lanes.py), row-swept and numpy-vectorised along the subject:
the horizontal-gap state E is serial along a row, but with
open+extend >= extend it collapses to the identity

    E[i][j] = max(E[i][j-1] - ge, cur'[i][j-1] - oeg),
    cur'    = max(0, diag + s, F)        (the E-independent cell part)

which is a 1-D max-plus prefix scan: E[i][j] = max_k (cur'[i][k] + k*ge)
- (j-1)*ge, computed with one np.maximum.accumulate per row (the same
decomposition the Pallas kernel's "fscan" column body uses for F).
Traceback sources are packed into one uint8[(m+1), (n+1)] flag matrix.
"""

import dataclasses

import numpy as np

from oswald_tpu.alphabet import decode

# flag layout: bits 0-1 = H source (0 stop, 1 diag, 2 E/horizontal,
# 3 F/vertical); bit 2 = E extends (else opens); bit 3 = F extends
_H_STOP, _H_DIAG, _H_E, _H_F = 0, 1, 2, 3
_E_EXT, _F_EXT = 4, 8

_NEG = np.int64(-(1 << 40))


@dataclasses.dataclass
class Alignment:
    """One gapped local alignment, BLAST-style 1-based inclusive coords."""
    score: int
    q_start: int
    q_end: int
    s_start: int
    s_end: int
    q_aln: str          # query row with '-' gaps
    s_aln: str          # subject row with '-' gaps
    midline: str        # '|' identity, '+' positive score, ' ' otherwise
    identities: int
    positives: int
    gaps: int

    @property
    def length(self) -> int:
        return len(self.q_aln)


def sw_align(query, subject, submat, open_gap: int, extend_gap: int,
             max_cells: int = 1 << 30) -> Alignment:
    """Exact affine-gap Smith-Waterman with traceback (score-parity with
    the device kernel and core.sw_score_numpy).

    query, subject: int8 encoded residues (alphabet.encode)
    submat:         int[24, 24] substitution matrix
    max_cells:      guard against pathological (query x subject) sizes —
                    the flag matrix is (m+1)(n+1) bytes
    """
    a = np.asarray(query, np.int64)
    b = np.asarray(subject, np.int64)
    m, n = len(a), len(b)
    if (m + 1) * (n + 1) > max_cells:
        raise ValueError(
            f"alignment matrix {m}x{n} exceeds max_cells={max_cells}")
    if m == 0 or n == 0:
        return Alignment(0, 0, -1, 0, -1, "", "", "", 0, 0, 0)
    sub = np.asarray(submat, np.int64)
    ge = np.int64(extend_gap)
    oeg = np.int64(open_gap + extend_gap)

    flags = np.zeros((m + 1, n + 1), np.uint8)
    h_prev = np.zeros(n + 1, np.int64)          # H[i-1, :]
    f_prev = np.full(n + 1, _NEG, np.int64)     # F[i-1, :]
    jdx = np.arange(1, n + 1, dtype=np.int64)
    best, bi, bj = np.int64(0), 0, 0

    for i in range(1, m + 1):
        srow = sub[a[i - 1], b]                 # s(a_i, b_j), j = 1..n
        f = np.maximum(f_prev[1:] - ge, h_prev[1:] - oeg)       # F[i, 1..n]
        diag = h_prev[:-1] + srow
        curp = np.maximum(np.maximum(diag, 0), f)               # E-free part
        # E[i, j] = max_{k<j} (curp[k] - oeg + (j-1-k)*(-ge)) via prefix max
        # A[k] = cur'[i][k] - oeg + k*ge (k = 1..n); E[i][j] =
        # max(A[1..j-1]) - (j-1)*ge = acc[j-2] - (j-1)*ge for j >= 2
        acc = np.maximum.accumulate(curp - oeg + jdx * ge)
        e = np.empty(n + 1, np.int64)
        e[0] = e[1] = _NEG
        e[2:] = acc[:-1] - jdx[:-1] * ge
        h = np.maximum(curp, e[1:])                             # H[i, 1..n]

        frow = np.zeros(n + 1, np.uint8)
        # H source priority: diag > E > F (any max-achieving source is a
        # valid optimal traceback; the order is just a deterministic choice)
        src = np.where(h <= 0, _H_STOP,
                       np.where(h == diag, _H_DIAG,
                                np.where(h == e[1:], _H_E, _H_F)))
        frow[1:] = src.astype(np.uint8)
        frow[1:] |= np.where(e[1:] == e[:-1] - ge, _E_EXT, 0).astype(np.uint8)
        frow[1:] |= np.where(f == f_prev[1:] - ge, _F_EXT, 0).astype(np.uint8)
        flags[i] = frow

        h_full = np.concatenate([[0], h])
        rb = int(np.argmax(h))
        if h[rb] > best:
            best, bi, bj = h[rb], i, rb + 1
        h_prev, f_prev = h_full, np.concatenate([[_NEG], f])

    if best <= 0:
        return Alignment(0, 0, -1, 0, -1, "", "", "", 0, 0, 0)

    # walk back from the best cell
    qa, sa = [], []
    i, j, state = bi, bj, "H"
    while i > 0 and j > 0:
        fl = flags[i, j]
        if state == "H":
            src = fl & 3
            if src == _H_STOP:
                break
            if src == _H_DIAG:
                qa.append(int(a[i - 1]))
                sa.append(int(b[j - 1]))
                i -= 1
                j -= 1
            elif src == _H_E:
                state = "E"
            else:
                state = "F"
        elif state == "E":                       # gap in query, consumes b_j
            qa.append(-1)
            sa.append(int(b[j - 1]))
            state = "E" if fl & _E_EXT else "H"
            j -= 1
        else:                                    # gap in subject, consumes a_i
            qa.append(int(a[i - 1]))
            sa.append(-1)
            state = "F" if fl & _F_EXT else "H"
            i -= 1
    qa.reverse()
    sa.reverse()

    ident = pos = gaps = 0
    mid = []
    for qc, sc in zip(qa, sa):
        if qc < 0 or sc < 0:
            gaps += 1
            mid.append(" ")
        elif qc == sc:
            ident += 1
            pos += 1
            mid.append("|")
        elif sub[qc, sc] > 0:
            pos += 1
            mid.append("+")
        else:
            mid.append(" ")
    q_aln = "".join("-" if c < 0 else decode([c]) for c in qa)
    s_aln = "".join("-" if c < 0 else decode([c]) for c in sa)
    return Alignment(score=int(best),
                     q_start=i + 1, q_end=bi, s_start=j + 1, s_end=bj,
                     q_aln=q_aln, s_aln=s_aln, midline="".join(mid),
                     identities=ident, positives=pos, gaps=gaps)


def align_hits(db, query, result, submat, open_gap: int, extend_gap: int):
    """Traceback for every hit in a SearchResult: returns [Alignment].

    db: the PackedDB searched (sequences recovered via db.sequence_of);
    result: engine SearchResult (seq_ids are sorted-order ids).
    Each alignment's score must equal the device score — callers may
    assert this (tests do); a mismatch means packing/scoring corruption.
    """
    out = []
    for sid in np.asarray(result.seq_ids):
        subj = db.sequence_of(int(sid))
        out.append(sw_align(query, subj, submat, open_gap, extend_gap))
    return out


def gap_opens(aln: Alignment) -> int:
    """Number of gap RUNS in the alignment (BLAST outfmt-6 'gapopen')."""
    runs = 0
    prev = False
    for qc, sc in zip(aln.q_aln, aln.s_aln):
        g = qc == "-" or sc == "-"
        if g and not prev:
            runs += 1
        prev = g
    return runs


def format_tabular(query_title: str, subject_title: str, aln: Alignment,
                   evalue: float | None, bits: float | None) -> str:
    """One BLAST outfmt-6 line: qseqid sseqid pident length mismatch
    gapopen qstart qend sstart send evalue bitscore (tab-separated;
    subject id = first whitespace token of the title, like BLAST)."""
    L = max(aln.length, 1)
    mism = L - aln.identities - aln.gaps if aln.length else 0
    pid = 100.0 * aln.identities / L
    ev = f"{evalue:.2g}" if evalue is not None else "n/a"
    bs = f"{bits:.1f}" if bits is not None else "n/a"
    return "\t".join([
        query_title.split()[0] if query_title else "query",
        subject_title.split()[0] if subject_title else "subject",
        f"{pid:.3f}", str(aln.length), str(mism), str(gap_opens(aln)),
        str(aln.q_start), str(aln.q_end), str(aln.s_start),
        str(aln.s_end), ev, bs])


def format_alignment(aln: Alignment, width: int = 60) -> str:
    """BLAST-style block rendering of one alignment."""
    if aln.length == 0:
        return " (no alignment: score 0)\n"
    lines = []
    L = aln.length
    pct = 100.0 * aln.identities / L
    ppos = 100.0 * aln.positives / L
    lines.append(f" Identities: {aln.identities}/{L} ({pct:.0f}%), "
                 f"Positives: {aln.positives}/{L} ({ppos:.0f}%), "
                 f"Gaps: {aln.gaps}/{L}")
    qp, sp = aln.q_start, aln.s_start
    for o in range(0, L, width):
        qs = aln.q_aln[o:o + width]
        ms = aln.midline[o:o + width]
        ss = aln.s_aln[o:o + width]
        qn = sum(1 for c in qs if c != "-")
        sn = sum(1 for c in ss if c != "-")
        # an all-gap row consumes nothing: label both ends with the last
        # consumed coordinate instead of an inverted start > end range
        q0, q1 = (qp, qp + qn - 1) if qn else (qp - 1, qp - 1)
        s0, s1 = (sp, sp + sn - 1) if sn else (sp - 1, sp - 1)
        lines.append(f" Query {q0:>5} {qs} {q1}")
        lines.append(f"       {'':>5} {ms}")
        lines.append(f" Sbjct {s0:>5} {ss} {s1}")
        qp += qn
        sp += sn
    return "\n".join(lines) + "\n"
