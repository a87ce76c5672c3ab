// nanorev native runtime: banded affine-gap glocal aligner.
//
// This is the C++ counterpart of the JAX banded Smith-Waterman labeler
// (nanoreviser_tpu/align/sw.py) and fills the role GraphMap (a native C++
// mapper, reference alignutils.py:30-63) plays in the reference's training
// pipeline: read -> per-column alignment against the seeded genome window.
//
// The DP recurrence, band geometry, tie-breaking and traceback are kept
// EXACTLY identical to _banded_align_emit/_traceback_host in align/sw.py —
// all score arithmetic is float32 with the same operation order, so on the
// integer-valued default scores the two paths produce identical (ops,
// j_start, score) triples (asserted in tests/test_native.py).
//
// Layout: one row of H/E per query base over a fixed-width band; moves are
// stored as one byte per cell and walked back on the host side of the call.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>
#include <immintrin.h>

namespace {

constexpr float NEG_INF = -1.0e9f;
constexpr int DIAG = 0, UP = 1, LEFT = 2;

// Exact double -> binary16 with single rounding (numpy's f64->f16
// assignment semantics). A plain double->float->half pipeline double-rounds
// by 1 ulp near halfway points; routing through round-to-odd at f32 makes
// the final f16 RN exact (valid because f32 keeps >= 2 extra bits over f16).
inline uint16_t f64_to_f16(double x) {
  float f = float(x);
  if (double(f) != x) {
    uint32_t b;
    std::memcpy(&b, &f, 4);
    if ((b & 1u) == 0) {  // inexact and even mantissa LSB: take the other
      float g = std::nextafterf(               // bracket (odd LSB)
          f, (x > double(f)) ? HUGE_VALF : -HUGE_VALF);
      f = g;
    }
  }
  return _cvtss_sh(f, _MM_FROUND_TO_NEAREST_INT);
}

inline int64_t j0_line(int64_t i, int64_t m, int64_t t_lead, int64_t span) {
    return t_lead + (span * i) / (m > 1 ? m : 1);
}

}  // namespace

extern "C" {

// Banded glocal alignment (read global, target local).
//   q, t     : base codes (A,C,G,T -> 0..3; anything else 4)
//   band     : band width (multiple of 4)
//   t_lead/t_tail : expected unaligned target overhangs (seed margins)
//   ops_out  : caller buffer of at least m + n bytes; moves in forward order
//   returns  : number of ops written, or -1 on error
int nr_banded_sw(
    const int8_t* q, int64_t m,
    const int8_t* t, int64_t n,
    int band, int64_t t_lead, int64_t t_tail,
    float match, float mismatch, float gap_open, float gap_extend,
    int8_t* ops_out, int64_t ops_cap,
    int64_t* j_start_out, float* score_out) {
    if (m < 1 || n < 1 || band < 4) return -1;

    const int half = band / 2;
    const int64_t span = std::max<int64_t>(n - t_lead - t_tail, 1);

    std::vector<float> h_prev(band), h_row(band), e_prev(band), e_row(band);
    std::vector<uint8_t> moves(static_cast<size_t>(m) * band, 0);

    // row 0: free leading target gap — H(0,j) = sub(q0, t_j)
    for (int k = 0; k < band; ++k) {
        int64_t j = j0_line(0, m, t_lead, span) + k - half;
        bool valid = j >= 0 && j < n;
        float sub = (valid && q[0] == t[j]) ? match : mismatch;
        h_prev[k] = valid ? sub : NEG_INF;
        e_prev[k] = NEG_INF;
    }

    for (int64_t i = 1; i < m; ++i) {
        const int64_t jc = j0_line(i, m, t_lead, span);
        const int64_t shift = jc - j0_line(i - 1, m, t_lead, span);
        uint8_t* mrow = moves.data() + static_cast<size_t>(i) * band;

        // in-row left-gap prefix max: run = max_{k'<=k} (h_nf(k') - k'*ext)
        float run = NEG_INF;
        for (int k = 0; k < band; ++k) {
            const int64_t sd = k + shift;
            const float h_diag =
                (sd - 1 >= 0 && sd - 1 < band) ? h_prev[sd - 1] : NEG_INF;
            const float h_up = (sd >= 0 && sd < band) ? h_prev[sd] : NEG_INF;
            const float e_up = (sd >= 0 && sd < band) ? e_prev[sd] : NEG_INF;

            const int64_t j = jc + k - half;
            const bool valid_j = j >= 0 && j < n;
            const float sub =
                (valid_j && q[i] == t[j]) ? match : mismatch;

            const float diag_score = h_diag + sub;
            const float e = std::max(h_up + gap_open, e_up + gap_extend);
            const float h_nf =
                valid_j ? std::max(diag_score, e) : NEG_INF;

            // f32 op order matches align/sw.py: (open + k*ext) + p_excl
            const float f = (gap_open + (float)k * gap_extend) + run;
            const float h = valid_j ? std::max(h_nf, f) : NEG_INF;

            run = std::max(run, h_nf - (float)k * gap_extend);

            h_row[k] = h;
            e_row[k] = e;
            mrow[k] = (h == diag_score) ? DIAG : ((h == e) ? UP : LEFT);
        }
        h_prev.swap(h_row);
        e_prev.swap(e_row);
    }

    // end column: first argmax on the true last row
    int k_end = 0;
    float best = h_prev[0];
    for (int k = 1; k < band; ++k) {
        if (h_prev[k] > best) { best = h_prev[k]; k_end = k; }
    }
    *score_out = best;

    // traceback (mirrors _traceback_host)
    std::vector<int8_t> rev;
    rev.reserve(m + 16);
    int64_t i = m - 1;
    int64_t j = j0_line(i, m, t_lead, span) + k_end - half;
    while (i > 0) {
        const int64_t k = j - j0_line(i, m, t_lead, span) + half;
        if (k < 0 || k >= band) {
            while (i > 0) { rev.push_back(DIAG); --i; --j; }
            break;
        }
        const int mv = moves[static_cast<size_t>(i) * band + k];
        if (mv == DIAG)      { rev.push_back(DIAG); --i; --j; }
        else if (mv == UP)   { rev.push_back(UP);   --i; }
        else                 { rev.push_back(LEFT); --j; }
    }
    rev.push_back(DIAG);  // row 0 consumes (q[0], t[j])

    const int64_t n_ops = static_cast<int64_t>(rev.size());
    if (n_ops > ops_cap) return -1;
    for (int64_t p = 0; p < n_ops; ++p) ops_out[p] = rev[n_ops - 1 - p];
    *j_start_out = j;
    return static_cast<int>(n_ops);
}

// Library version tag (lets the loader detect stale binaries).
// ---------------------------------------------------------------------------
// Per-read inference prep: the C++ counterpart of signal/host_prep.prep_read
// (reference preprocessing.py:85-170 semantics). One pass over the signal
// computes the exact histogram MAD normalizers (numpy-median semantics,
// identical to segmentation.mad_normalizers_int16), exact event moments, the
// raw int16 window gather with the reference's clamp + symmetric-pad split,
// and the 6 f16 feature columns. ctypes releases the GIL for the call, so
// hostpipe workers/threads scale it across cores; ~0.3 ms/read replaces
// ~3.4 ms of numpy.
//
//   tail      : int16 raw signal from read_start_rel_to_raw on          [S]
//   starts    : int32 base starts relative to the tail (monotone)       [N]
//   bases     : ascii base characters                                   [N]
//   durations : f32 per-base durations incl. the 3/5-rule tail          [N]
//   ab_mean/ab_std : f32 event-table moments                            [N]
//   shift/scale    : in: <= -1e30 means "compute here"; out: the values used
//   win_out   : int16 [N, qlen] raw window samples (cols outside the valid
//               span are zero; the DEVICE re-zeroes them post-normalize)
//   vlen_out  : u8 [N] valid window length
//   feats_out : u16 [N, 6] IEEE-754 binary16 bits
// Returns 0, or -1 on invalid input.

int nr_prep_read(
    const int16_t* tail, int64_t n_samples,
    const int32_t* starts, int64_t n_bases,
    const uint8_t* bases,
    const float* durations,
    const float* ab_mean, const float* ab_std,
    int qlen,
    double* shift_io, double* scale_io,
    int16_t* win_out, uint8_t* vlen_out, uint16_t* feats_out) {
  if (n_samples < 1 || n_bases < 1 || qlen < 2 || qlen > 255) return -1;

  // --- exact histogram median / MAD (numpy semantics: mean of the two
  // middle ranks). Matches segmentation._hist_median_int bit-for-bit.
  double shift = *shift_io, scale = *scale_io;
  if (shift <= -1e30) {
    int16_t mn = tail[0], mx = tail[0];
    for (int64_t i = 1; i < n_samples; ++i) {
      mn = std::min(mn, tail[i]);
      mx = std::max(mx, tail[i]);
    }
    const int span = int(mx) - int(mn) + 1;
    std::vector<int64_t> hist(span, 0);
    for (int64_t i = 0; i < n_samples; ++i) hist[tail[i] - mn]++;
    auto hist_median = [&](const std::vector<int64_t>& h, int64_t n) {
      const int64_t lo_rank = (n - 1) / 2, hi_rank = n / 2;
      int64_t csum = 0, lo = -1, hi = -1;
      for (size_t b = 0; b < h.size(); ++b) {
        csum += h[b];
        if (lo < 0 && csum >= lo_rank + 1) lo = int64_t(b);
        if (csum >= hi_rank + 1) { hi = int64_t(b); break; }
      }
      return (double(lo) + double(hi)) / 2.0;
    };
    shift = hist_median(hist, n_samples) + mn;
    const int64_t two_shift = int64_t(std::llround(2.0 * shift));
    std::vector<int64_t> hist2(2 * size_t(span) + 2, 0);
    for (int64_t i = 0; i < n_samples; ++i) {
      int64_t d = 2 * (int64_t(tail[i]) - mn) - (two_shift - 2 * int64_t(mn));
      hist2[size_t(d < 0 ? -d : d)]++;
    }
    scale = hist_median(hist2, n_samples) * 0.5;
    *shift_io = shift;
    *scale_io = scale;
  }

  const int ahead = qlen / 2;
  // color table: A=250 G=180 T=100 C=30, else 0 (features.py)
  double color[256] = {0};
  color['A'] = 250.0; color['G'] = 180.0; color['T'] = 100.0; color['C'] = 30.0;

  for (int64_t i = 0; i < n_bases; ++i) {
    const int64_t st = starts[i];
    // window gather with the reference's clamp; zero-fill the pad columns
    const int64_t w_st = std::max<int64_t>(st - ahead, 0);
    const int64_t w_en = std::min<int64_t>(st + (qlen - ahead), n_samples);
    const int64_t vl = std::max<int64_t>(w_en - w_st, 0);
    const int64_t left = (qlen - vl + 1) / 2;
    int16_t* row = win_out + i * qlen;
    std::memset(row, 0, size_t(qlen) * sizeof(int16_t));
    if (vl > 0) std::memcpy(row + left, tail + w_st, size_t(vl) * sizeof(int16_t));
    vlen_out[i] = uint8_t(vl);

    // exact event moments over [st, en)
    const int64_t en_raw =
        (i + 1 < n_bases) ? starts[i + 1] : st + int64_t(durations[i]);
    const int64_t en = std::min<int64_t>(en_raw, n_samples);
    int64_t s1 = 0, s2 = 0;
    for (int64_t j = st; j < en; ++j) {
      const int64_t v = tail[j];
      s1 += v;
      s2 += v * v;
    }
    const double cnt = double(std::max<int64_t>(en - st, 1));
    const double mean = double(s1) / cnt;
    const double var = std::max(double(s2) / cnt - mean * mean, 0.0);

    uint16_t* fr = feats_out + i * 6;
    // all f64 math + single-rounded f64->f16, matching the numpy path
    // bit-for-bit (tests/test_native.py asserts exact feature equality)
    fr[0] = f64_to_f16(color[bases[i]] * (1.0 / 300.0));
    fr[1] = f64_to_f16(mean / shift);
    fr[2] = f64_to_f16(std::sqrt(var) / scale);
    fr[3] = f64_to_f16(double(durations[i]) * 0.1);
    fr[4] = _cvtss_sh(ab_mean[i], _MM_FROUND_TO_NEAREST_INT);
    fr[5] = _cvtss_sh(ab_std[i], _MM_FROUND_TO_NEAREST_INT);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Compacted inference prep: C++ counterpart of host_prep.compact_read_numpy
// (the production upload format — see ops/window_gather.py). One pass copies
// the union of clamped window intervals [st-25, st+25) into csig_out (gaps
// larger than the window — translocation stalls — are dropped), emits the
// per-base gather start pos0 = cst - left in compacted coordinates, and
// computes the same exact MAD normalizers / event moments / f16 features as
// nr_prep_read. All float math mirrors the numpy path op-for-op (divisions,
// not reciprocal-multiplies) so parity is exact.
//
// Returns m (compacted sample count) >= 0, or -1 on invalid input, -2 if
// csig_cap is too small.

int64_t nr_compact_read(
    const int16_t* tail, int64_t n_samples,
    const int32_t* starts, int64_t n_bases,
    const uint8_t* bases,
    const float* durations,
    const float* ab_mean, const float* ab_std,
    int qlen,
    double* shift_io, double* scale_io,
    int16_t* csig_out, int64_t csig_cap,
    int32_t* pos0_out, uint8_t* vlen_out, uint16_t* feats_out) {
  if (n_samples < 1 || n_bases < 1 || qlen < 2 || qlen > 255) return -1;

  double shift = *shift_io, scale = *scale_io;
  if (shift <= -1e30) {
    int16_t mn = tail[0], mx = tail[0];
    for (int64_t i = 1; i < n_samples; ++i) {
      mn = std::min(mn, tail[i]);
      mx = std::max(mx, tail[i]);
    }
    const int span = int(mx) - int(mn) + 1;
    std::vector<int64_t> hist(span, 0);
    for (int64_t i = 0; i < n_samples; ++i) hist[tail[i] - mn]++;
    auto hist_median = [&](const std::vector<int64_t>& h, int64_t n) {
      const int64_t lo_rank = (n - 1) / 2, hi_rank = n / 2;
      int64_t csum = 0, lo = -1, hi = -1;
      for (size_t b = 0; b < h.size(); ++b) {
        csum += h[b];
        if (lo < 0 && csum >= lo_rank + 1) lo = int64_t(b);
        if (csum >= hi_rank + 1) { hi = int64_t(b); break; }
      }
      return (double(lo) + double(hi)) / 2.0;
    };
    shift = hist_median(hist, n_samples) + mn;
    const int64_t two_shift = int64_t(std::llround(2.0 * shift));
    std::vector<int64_t> hist2(2 * size_t(span) + 2, 0);
    for (int64_t i = 0; i < n_samples; ++i) {
      int64_t d = 2 * (int64_t(tail[i]) - mn) - (two_shift - 2 * int64_t(mn));
      hist2[size_t(d < 0 ? -d : d)]++;
    }
    scale = hist_median(hist2, n_samples) * 0.5;
    *shift_io = shift;
    *scale_io = scale;
  }

  const int ahead = qlen / 2;
  double color[256] = {0};
  color['A'] = 250.0; color['G'] = 180.0; color['T'] = 100.0; color['C'] = 30.0;

  int64_t m = 0;          // compacted cursor
  int64_t src_hi = -1;    // source index of the compacted buffer's end
  int64_t ioff = 0;       // current interval: compacted - source offset
  for (int64_t i = 0; i < n_bases; ++i) {
    const int64_t st = starts[i];
    const int64_t w_st = std::max<int64_t>(st - ahead, 0);
    const int64_t w_en = std::min<int64_t>(st + (qlen - ahead), n_samples);
    const int64_t vl = std::max<int64_t>(w_en - w_st, 0);
    const int64_t left = (qlen - vl + 1) / 2;

    if (src_hi < 0 || w_st > src_hi) {       // start a new interval
      if (m + (w_en - w_st) > csig_cap) return -2;
      std::memcpy(csig_out + m, tail + w_st,
                  size_t(w_en - w_st) * sizeof(int16_t));
      ioff = m - w_st;
      m += w_en - w_st;
      src_hi = w_en;
    } else if (w_en > src_hi) {              // extend the current interval
      if (m + (w_en - src_hi) > csig_cap) return -2;
      std::memcpy(csig_out + m, tail + src_hi,
                  size_t(w_en - src_hi) * sizeof(int16_t));
      m += w_en - src_hi;
      src_hi = w_en;
    }
    pos0_out[i] = int32_t(w_st + ioff - left);
    vlen_out[i] = uint8_t(vl);

    const int64_t en_raw =
        (i + 1 < n_bases) ? starts[i + 1] : st + int64_t(durations[i]);
    const int64_t en = std::min<int64_t>(en_raw, n_samples);
    int64_t s1 = 0, s2 = 0;
    for (int64_t j = st; j < en; ++j) {
      const int64_t v = tail[j];
      s1 += v;
      s2 += v * v;
    }
    const double cnt = double(std::max<int64_t>(en - st, 1));
    const double mean = double(s1) / cnt;
    const double var = std::max(double(s2) / cnt - mean * mean, 0.0);

    uint16_t* fr = feats_out + i * 6;
    // all f64 math + single-rounded f64->f16, matching the numpy path
    // bit-for-bit (tests/test_native.py asserts exact feature equality)
    fr[0] = f64_to_f16(color[bases[i]] * (1.0 / 300.0));
    fr[1] = f64_to_f16(mean / shift);
    fr[2] = f64_to_f16(std::sqrt(var) / scale);
    fr[3] = f64_to_f16(double(durations[i]) * 0.1);
    fr[4] = _cvtss_sh(ab_mean[i], _MM_FROUND_TO_NEAREST_INT);
    fr[5] = _cvtss_sh(ab_std[i], _MM_FROUND_TO_NEAREST_INT);
  }
  return m;
}

int nr_abi_version() { return 3; }

}  // extern "C"
