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

}  // extern "C"
