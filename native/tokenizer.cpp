// Native host-side data loader: FASTA parsing + DNA tokenization.
//
// The reference delegates all heavy compute to C++ binaries; in this
// framework the device owns the compute, and the remaining native-worthy
// hot path is host ingest: tokenizing multi-megabase FASTA sections of
// thousands of GFF files (SURVEY.md §2.1 "GFF reader"; the Python parser
// manages ~30 MB/s, this loader ~1 GB/s).  Exposed via a plain C ABI and
// loaded with ctypes (no pybind11 in the image); peppan_tpu/io/native.py
// builds it on first use and falls back to pure Python when unavailable.
//
// Token convention (must match peppan_tpu/io/alphabet.py):
//   A=0 C=1 G=2 T=3, every other letter = N = 4, PAD = 5.

#include <cstdint>
#include <cstring>

namespace {

int8_t g_lut[256];
bool g_init = false;

void init_lut() {
  if (g_init) return;
  for (int i = 0; i < 256; ++i) g_lut[i] = 4;
  g_lut[(unsigned)'A'] = 0; g_lut[(unsigned)'a'] = 0;
  g_lut[(unsigned)'C'] = 1; g_lut[(unsigned)'c'] = 1;
  g_lut[(unsigned)'G'] = 2; g_lut[(unsigned)'g'] = 2;
  g_lut[(unsigned)'T'] = 3; g_lut[(unsigned)'t'] = 3;
  g_init = true;
}

}  // namespace

extern "C" {

// ASCII -> int8 tokens. out must have n bytes.
void pt_tokenize_dna(const char* seq, int64_t n, int8_t* out) {
  init_lut();
  for (int64_t i = 0; i < n; ++i) out[i] = g_lut[(unsigned char)seq[i]];
}

// Reverse complement tokens in place-compatible buffers (in != out).
void pt_revcomp(const int8_t* in, int64_t n, int8_t* out) {
  static const int8_t comp[6] = {3, 2, 1, 0, 4, 5};
  for (int64_t i = 0; i < n; ++i) out[i] = comp[in[n - 1 - i]];
}

// Parse a FASTA buffer in one pass.
//   buf, n        : raw file bytes (the part after ##FASTA, or a whole
//                   .fna file)
//   tokens_out    : capacity n; receives concatenated contig tokens
//   contig_starts : capacity max_contigs+1; contig_starts[i] = offset of
//                   contig i in tokens_out; [n_contigs] = total tokens
//   name_starts   : capacity max_contigs; byte offset of each contig name
//                   in buf (first word after '>')
//   name_lens     : capacity max_contigs
// Returns n_contigs, or -1 if max_contigs would be exceeded.
int64_t pt_fasta_tokenize(const char* buf, int64_t n, int8_t* tokens_out,
                          int64_t* contig_starts, int64_t* name_starts,
                          int32_t* name_lens, int64_t max_contigs) {
  init_lut();
  int64_t n_contigs = 0;
  int64_t out_pos = 0;
  int64_t i = 0;
  while (i < n) {
    char c = buf[i];
    if (c == '>') {
      if (n_contigs >= max_contigs) return -1;
      ++i;
      int64_t name_start = i;
      while (i < n && buf[i] != ' ' && buf[i] != '\t' && buf[i] != '\n' &&
             buf[i] != '\r')
        ++i;
      name_starts[n_contigs] = name_start;
      name_lens[n_contigs] = (int32_t)(i - name_start);
      contig_starts[n_contigs] = out_pos;
      ++n_contigs;
      // skip rest of header line
      while (i < n && buf[i] != '\n') ++i;
      ++i;
      continue;
    }
    if (n_contigs == 0) {  // junk before first '>': skip the line
      while (i < n && buf[i] != '\n') ++i;
      ++i;
      continue;
    }
    // sequence line
    while (i < n) {
      unsigned char u = (unsigned char)buf[i];
      if (u == '\n') { ++i; break; }
      if (u != '\r' && u != ' ' && u != '\t')
        tokens_out[out_pos++] = g_lut[u];
      ++i;
    }
  }
  contig_starts[n_contigs] = out_pos;
  return n_contigs;
}

// Full-matrix affine-gap Smith-Waterman with traceback.
//
// Bit-exact counterpart of peppan_tpu/ops/sw_oracle.py::sw_traceback (the
// python oracle stays as the independent cross-check); this native version
// exists because the two-pass CIGAR refinement of claimed regions
// (SURVEY.md §7.3.3: "traceback second pass only for winning pairs") runs
// over thousands of gene-sized matrices per pan-genome and the per-cell
// python DP is ~1 us/cell.
//
// Tie-breaks (shared semantics, see sw_oracle module docstring):
//   H: diag > E > F > reset;  E/F: open >= extend;
//   best cell: first strictly-greater score in row-major (i, j) order.
//
//   q, m          : query tokens / length
//   t, n          : target tokens / length
//   submat, a     : int32[a*a] substitution matrix over token ids
//   n_real        : tokens < n_real count as identity matches
//   out_stats[7]  : score, qstart, qend, tstart, tend, matches, aln_len
//   cigar_ops     : capacity >= m+n; 0='M', 1='I' (gap in target,
//                   query char consumed), 2='D' (gap in query, target
//                   char consumed) — sw_oracle's op letters
//   cigar_lens    : capacity >= m+n
//   work          : caller-provided scratch, >= 3*(m+1)*(n+1) bytes
// Returns the number of cigar runs (>= 0), or -1 when m*n overflows.
int64_t pt_sw_traceback(const int8_t* q, int64_t m, const int8_t* t,
                        int64_t n, const int32_t* submat, int32_t a,
                        int32_t gap_open, int32_t gap_extend,
                        int32_t n_real, int32_t* out_stats,
                        uint8_t* cigar_ops, int32_t* cigar_lens,
                        int8_t* work) {
  const int64_t W = n + 1;
  if (m <= 0 || n <= 0 || m * n > (int64_t)1 << 40) return -1;
  const int32_t NEGV = -1000000;
  const int32_t fo = gap_open + gap_extend;
  int8_t* CH = work;                 // choice codes per cell
  int8_t* CE = work + (m + 1) * W;
  int8_t* CF = work + 2 * (m + 1) * W;

  // rolling rows for H/F (previous + current), E needs current row only
  int32_t* Hprev = new int32_t[W];
  int32_t* Hcur = new int32_t[W];
  int32_t* Fprev = new int32_t[W];
  int32_t* Fcur = new int32_t[W];
  for (int64_t j = 0; j < W; ++j) { Hprev[j] = 0; Fprev[j] = NEGV; }
  int32_t best = 0;
  int64_t bi = 0, bj = 0;
  for (int64_t i = 1; i <= m; ++i) {
    Hcur[0] = 0;
    Fcur[0] = NEGV;
    int32_t Eleft = NEGV;
    const int32_t* srow = submat + (int32_t)q[i - 1] * a;
    int8_t* chr = CH + i * W;
    int8_t* cer = CE + i * W;
    int8_t* cfr = CF + i * W;
    for (int64_t j = 1; j <= n; ++j) {
      int32_t e_open = Hcur[j - 1] - fo;
      int32_t e_ext = Eleft - gap_extend;
      int32_t E = e_open >= e_ext ? e_open : e_ext;
      cer[j] = e_open >= e_ext ? 0 : 1;
      int32_t f_open = Hprev[j] - fo;
      int32_t f_ext = Fprev[j] - gap_extend;
      int32_t F = f_open >= f_ext ? f_open : f_ext;
      cfr[j] = f_open >= f_ext ? 0 : 1;
      int32_t dv = Hprev[j - 1] + srow[(int32_t)t[j - 1]];
      int32_t hv = dv;
      if (E > hv) hv = E;
      if (F > hv) hv = F;
      if (hv < 0) hv = 0;
      int8_t ch;
      if (dv == hv && hv > 0) ch = 1;
      else if (E == hv && hv > 0) ch = 2;
      else if (F == hv && hv > 0) ch = 3;
      else { ch = 0; }
      chr[j] = ch;
      Hcur[j] = hv;
      Fcur[j] = F;
      Eleft = E;
      if (hv > best) { best = hv; bi = i; bj = j; }
    }
    int32_t* sw1 = Hprev; Hprev = Hcur; Hcur = sw1;
    int32_t* sw2 = Fprev; Fprev = Fcur; Fcur = sw2;
  }

  // traceback (identical walk to the python oracle)
  int64_t i = bi, j = bj;
  int32_t matches = 0, aln_len = 0;
  int64_t n_runs = 0;
  int state = 0;  // 0 = H, 1 = E, 2 = F
  auto push = [&](uint8_t op) {
    ++aln_len;
    if (n_runs && cigar_ops[n_runs - 1] == op) { ++cigar_lens[n_runs - 1]; }
    else { cigar_ops[n_runs] = op; cigar_lens[n_runs] = 1; ++n_runs; }
  };
  while (i > 0 && j > 0) {
    if (state == 0) {
      int8_t c = CH[i * W + j];
      if (c == 0) break;
      if (c == 1) {
        push(0);  // M
        if (q[i - 1] == t[j - 1] && q[i - 1] < n_real && t[j - 1] < n_real)
          ++matches;
        --i; --j;
      } else if (c == 2) state = 1;
      else state = 2;
    } else if (state == 1) {
      push(2);  // D: gap in query, target char consumed
      if (CE[i * W + j] == 0) state = 0;
      --j;
    } else {
      push(1);  // I: gap in target, query char consumed
      if (CF[i * W + j] == 0) state = 0;
      --i;
    }
  }
  // runs were collected end-to-start: reverse
  for (int64_t k = 0; k < n_runs / 2; ++k) {
    uint8_t to = cigar_ops[k];
    cigar_ops[k] = cigar_ops[n_runs - 1 - k];
    cigar_ops[n_runs - 1 - k] = to;
    int32_t tl = cigar_lens[k];
    cigar_lens[k] = cigar_lens[n_runs - 1 - k];
    cigar_lens[n_runs - 1 - k] = tl;
  }
  out_stats[0] = best;
  out_stats[1] = (int32_t)i;        // qstart
  out_stats[2] = (int32_t)(bi - 1); // qend
  out_stats[3] = (int32_t)j;        // tstart
  out_stats[4] = (int32_t)(bj - 1); // tend
  out_stats[5] = matches;
  out_stats[6] = aln_len;
  delete[] Hprev; delete[] Hcur; delete[] Fprev; delete[] Fcur;
  return n_runs;
}

}  // extern "C"
