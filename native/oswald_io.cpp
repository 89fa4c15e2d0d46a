// oswald_io: native IO layer for oswald-tpu.
//
// Native replacement for the hot host-side data path, mirroring the role of
// the reference's C host data layer (/root/reference/host/src/sequences.c:
// preprocess_db :4-220, load_query_sequences :223-391) and its vendored
// C++ utility layer (common/src/AOCL_Utils.cpp).  The TPU compute path is
// JAX/Pallas; this library feeds it:
//
//   - oswald_fasta_scan:   single pass over a FASTA buffer -> record count,
//                          per-record residue lengths, encoded residues
//                          (codes 0..23, J/O/U and unknown bytes -> dummy),
//                          header byte ranges.  OpenMP-parallel over chunks.
//   - oswald_pack_group:   scatter length-sorted encoded sequences into one
//                          [L, 1024] lane-major group (the [8,128] VPU tile
//                          flattened), dummy-padded.
//
// Exact behavioral parity with the Python implementation in
// oswald_tpu/io/fasta.py is enforced by tests/test_native_io.py.

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int8_t kDummy = 23;

// residue LUT matching oswald_tpu.alphabet: 'A'..'Z' minus J/O/U densely
// mapped to 0..22 (case-insensitive), everything else dummy.
struct Lut {
  int8_t m[256];
  bool skip[256];  // bytes dropped inside sequence lines: \r, space, \t
  Lut() {
    const char* alpha = "ABCDEFGHIKLMNPQRSTVWXYZ";
    for (int i = 0; i < 256; ++i) m[i] = kDummy;
    for (int i = 0; alpha[i]; ++i) {
      m[(unsigned char)alpha[i]] = (int8_t)i;
      m[(unsigned char)(alpha[i] + 32)] = (int8_t)i;
    }
    for (int i = 0; i < 256; ++i) skip[i] = false;
    skip[(unsigned char)'\r'] = skip[(unsigned char)' '] =
        skip[(unsigned char)'\t'] = true;
  }
};
const Lut kLut;

}  // namespace

extern "C" {

// Pass 1: count records and the total residue bytes (upper bound: all
// non-header, non-newline, non-skip bytes).  Returns record count.
int64_t oswald_fasta_count(const uint8_t* buf, int64_t n,
                           int64_t* total_residues_ub) {
  int64_t records = 0, resid = 0;
  bool at_line_start = true, in_header = false;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t c = buf[i];
    if (at_line_start) {
      in_header = (c == '>');
      if (in_header) ++records;
      at_line_start = false;
    }
    if (c == '\n') {
      at_line_start = true;
      in_header = false;
      continue;
    }
    if (!in_header && !kLut.skip[c]) ++resid;
  }
  *total_residues_ub = resid;
  return records;
}

// Pass 2: encode residues and record lengths + header extents.
// Preconditions: arrays sized from oswald_fasta_count.
//   seq_out:       int8 [total_residues_ub]
//   lengths_out:   int64 [records]
//   hdr_starts/hdr_ends: int64 [records], byte offsets of header text
//                  (after '>', up to but excluding '\n'/'\r')
// Returns number of residues written (== sum(lengths_out)).
int64_t oswald_fasta_encode(const uint8_t* buf, int64_t n, int8_t* seq_out,
                            int64_t* lengths_out, int64_t* hdr_starts,
                            int64_t* hdr_ends) {
  int64_t rec = -1, w = 0;
  bool at_line_start = true, in_header = false;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t c = buf[i];
    if (at_line_start) {
      in_header = (c == '>');
      if (in_header) {
        ++rec;
        lengths_out[rec] = 0;
        hdr_starts[rec] = i + 1;
        hdr_ends[rec] = i + 1;
      }
      at_line_start = false;
    }
    if (c == '\n') {
      at_line_start = true;
      in_header = false;
      continue;
    }
    if (in_header) {
      if (c != '\r') hdr_ends[rec] = i + 1;
    } else if (rec >= 0 && !kLut.skip[c]) {
      seq_out[w++] = kLut.m[c];
      ++lengths_out[rec];
    }
  }
  return w;
}

// Pack one group of up to 1024 length-sorted sequences into a lane-major
// [L, 1024] int8 block (dummy-padded), the flattened [L, 8, 128] VPU tile.
//   seqs:     concatenated encoded residues
//   offsets:  int64 [count+1] into seqs (sequence k = [offsets[k],
//             offsets[k+1]))
//   count:    sequences in this group (<= 1024); lanes >= count stay dummy
//   L:        padded group length
//   out:      int8 [L * 1024]
void oswald_pack_group(const int8_t* seqs, const int64_t* offsets,
                       int64_t count, int64_t L, int8_t* out) {
  std::memset(out, kDummy, (size_t)(L * 1024));
  for (int64_t k = 0; k < count; ++k) {
    const int8_t* src = seqs + offsets[k];
    int64_t len = offsets[k + 1] - offsets[k];
    if (len > L) len = L;
    for (int64_t p = 0; p < len; ++p) out[p * 1024 + k] = src[p];
  }
}

// Pack many groups in parallel (OpenMP over groups).
//   group_starts: int64 [n_groups+1], sequence index where each group begins
//   offsets:      int64 [total_seqs+1]
//   Ls:           int64 [n_groups] padded lengths
//   outs:         int8, concatenated [L_g * 1024] blocks in group order
//   out_offsets:  int64 [n_groups] byte offset of each group's block in outs
void oswald_pack_groups(const int8_t* seqs, const int64_t* offsets,
                        const int64_t* group_starts, int64_t n_groups,
                        const int64_t* Ls, int8_t* outs,
                        const int64_t* out_offsets) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t g = 0; g < n_groups; ++g) {
    int64_t lo = group_starts[g], hi = group_starts[g + 1];
    oswald_pack_group(seqs, offsets + lo, hi - lo, Ls[g],
                      outs + out_offsets[g]);
  }
}

// ABI version; oswald_tpu.io.native refuses to use a library whose version
// does not match its expectation (a stale build from an older checkout
// could otherwise silently diverge from this source).
int oswald_io_version() { return 2; }

}  // extern "C"
