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
#include <cstdio>
#include <vector>
#include <string>
#include <algorithm>
#include <cmath>
#include <dlfcn.h>
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

// Exact histogram median/MAD (numpy semantics; matches
// segmentation._hist_median_int bit-for-bit).
inline void mad_core(const int16_t* tail, int64_t n_samples,
                     double* shift_out, double* scale_out) {
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
  const double shift = hist_median(hist, n_samples) + mn;
  const int64_t two_shift = int64_t(std::llround(2.0 * shift));
  std::vector<int64_t> hist2(2 * size_t(span) + 2, 0);
  for (int64_t i = 0; i < n_samples; ++i) {
    int64_t d = 2 * (int64_t(tail[i]) - mn) - (two_shift - 2 * int64_t(mn));
    hist2[size_t(d < 0 ? -d : d)]++;
  }
  *shift_out = shift;
  *scale_out = hist_median(hist2, n_samples) * 0.5;
}

// Compaction + moments + features core (see nr_compact_read docs).
inline int64_t compact_core(
    const int16_t* tail, int64_t n_samples,
    const int32_t* starts, int64_t n_bases,
    const uint8_t* bases,
    const double* durations,           // f64 (exact for integer durations)
    const float* ab_mean, const float* ab_std,
    int qlen, double shift, double scale,
    int16_t* csig_out, int64_t csig_cap,
    int32_t* pos0_out, uint8_t* vlen_out, uint16_t* feats_out) {
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
    fr[0] = f64_to_f16(color[bases[i]] * (1.0 / 300.0));
    fr[1] = f64_to_f16(mean / shift);
    fr[2] = f64_to_f16(std::sqrt(var) / scale);
    fr[3] = f64_to_f16(durations[i] * 0.1);
    fr[4] = _cvtss_sh(ab_mean[i], _MM_FROUND_TO_NEAREST_INT);
    fr[5] = _cvtss_sh(ab_std[i], _MM_FROUND_TO_NEAREST_INT);
  }
  return m;
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
  if (*shift_io <= -1e30) mad_core(tail, n_samples, shift_io, scale_io);
  std::vector<double> dur64(n_bases);
  for (int64_t i = 0; i < n_bases; ++i) dur64[i] = double(durations[i]);
  return compact_core(tail, n_samples, starts, n_bases, bases, dur64.data(),
                      ab_mean, ab_std, qlen, *shift_io, *scale_io,
                      csig_out, csig_cap, pos0_out, vlen_out, feats_out);
}

int nr_abi_version() { return 6; }

}  // extern "C"

// ---------------------------------------------------------------------------
// Native fast5 ingest: HDF5 decode + compaction in ONE call.
//
// The reference's hottest host loop is its per-event fast5 decode
// (nanorev_fast5_handeler.py:84-118); our h5py path is vectorized but still
// costs ~4 ms/read of interpreter + HDF5 overhead on the 2-core host. This
// section talks to HDF5 directly (dlopen of h5py's bundled libhdf5, so no
// headers or link-time deps), reproducing io/fast5.get_read_data semantics
// exactly: move-semantics event decode (0 / 1 / 2-with-double-emission /
// >=3), legacy x4000 seconds rescale when the basecaller version parses
// <= 0.0, the 3/5 last-duration rule, and the signal-length check. Output
// feeds compact_core directly, so one ctypes call replaces the whole
// decode+prep worker hot path.
//
// Any failure returns a negative code and the Python caller falls back to
// the h5py path (which produces the reference's Fast5Error degradation
// messages) — the native path is a fast path, never a behavior change.

typedef int64_t hid_t_;
typedef int herr_t_;
typedef unsigned long long hsize_t_;
typedef long long hssize_t_;

namespace h5 {

struct Api {
  void* handle = nullptr;
  herr_t_ (*H5open)();
  herr_t_ (*H5Eset_auto2)(hid_t_, void*, void*);
  hid_t_ (*H5Fopen)(const char*, unsigned, hid_t_);
  herr_t_ (*H5Fclose)(hid_t_);
  hid_t_ (*H5Dopen2)(hid_t_, const char*, hid_t_);
  herr_t_ (*H5Dclose)(hid_t_);
  hid_t_ (*H5Dget_space)(hid_t_);
  hid_t_ (*H5Dget_type)(hid_t_);
  herr_t_ (*H5Dread)(hid_t_, hid_t_, hid_t_, hid_t_, hid_t_, void*);
  hssize_t_ (*H5Sget_simple_extent_npoints)(hid_t_);
  herr_t_ (*H5Sclose)(hid_t_);
  hid_t_ (*H5Tcreate)(int, size_t);
  hid_t_ (*H5Tcopy)(hid_t_);
  herr_t_ (*H5Tset_size)(hid_t_, size_t);
  size_t (*H5Tget_size)(hid_t_);
  int (*H5Tget_nmembers)(hid_t_);
  char* (*H5Tget_member_name)(hid_t_, unsigned);
  hid_t_ (*H5Tget_member_type)(hid_t_, unsigned);
  herr_t_ (*H5Tinsert)(hid_t_, const char*, size_t, hid_t_);
  int (*H5Tis_variable_str)(hid_t_);
  herr_t_ (*H5Tclose)(hid_t_);
  hid_t_ (*H5Gopen2)(hid_t_, const char*, hid_t_);
  herr_t_ (*H5Gclose)(hid_t_);
  int (*H5Aexists)(hid_t_, const char*);
  hid_t_ (*H5Aopen)(hid_t_, const char*, hid_t_);
  hid_t_ (*H5Aget_type)(hid_t_);
  herr_t_ (*H5Aread)(hid_t_, hid_t_, void*);
  herr_t_ (*H5Aclose)(hid_t_);
  herr_t_ (*H5Literate2)(hid_t_, int, int, hsize_t_*,
                         herr_t_ (*)(hid_t_, const char*, const void*, void*),
                         void*);
  herr_t_ (*H5free_memory)(void*);
  int (*H5Tget_cset)(hid_t_);
  herr_t_ (*H5Tset_cset)(hid_t_, int);
  hid_t_* native_double;
  hid_t_* native_float;
  hid_t_* native_int;
  hid_t_* native_short;
  hid_t_* c_s1;
  bool ok = false;
};

Api api;

template <typename T>
bool sym(void* h, const char* name, T* out) {
  *out = reinterpret_cast<T>(dlsym(h, name));
  return *out != nullptr;
}

bool init(const char* libpath) {
  if (api.ok) return true;
  void* h = dlopen(libpath, RTLD_NOW | RTLD_GLOBAL);
  if (!h) return false;
  bool ok = true;
  ok &= sym(h, "H5open", &api.H5open);
  ok &= sym(h, "H5Eset_auto2", &api.H5Eset_auto2);
  ok &= sym(h, "H5Fopen", &api.H5Fopen);
  ok &= sym(h, "H5Fclose", &api.H5Fclose);
  ok &= sym(h, "H5Dopen2", &api.H5Dopen2);
  ok &= sym(h, "H5Dclose", &api.H5Dclose);
  ok &= sym(h, "H5Dget_space", &api.H5Dget_space);
  ok &= sym(h, "H5Dget_type", &api.H5Dget_type);
  ok &= sym(h, "H5Dread", &api.H5Dread);
  ok &= sym(h, "H5Sget_simple_extent_npoints", &api.H5Sget_simple_extent_npoints);
  ok &= sym(h, "H5Sclose", &api.H5Sclose);
  ok &= sym(h, "H5Tcreate", &api.H5Tcreate);
  ok &= sym(h, "H5Tcopy", &api.H5Tcopy);
  ok &= sym(h, "H5Tset_size", &api.H5Tset_size);
  ok &= sym(h, "H5Tget_size", &api.H5Tget_size);
  ok &= sym(h, "H5Tget_nmembers", &api.H5Tget_nmembers);
  ok &= sym(h, "H5Tget_member_name", &api.H5Tget_member_name);
  ok &= sym(h, "H5Tget_member_type", &api.H5Tget_member_type);
  ok &= sym(h, "H5Tinsert", &api.H5Tinsert);
  ok &= sym(h, "H5Tis_variable_str", &api.H5Tis_variable_str);
  ok &= sym(h, "H5Tclose", &api.H5Tclose);
  ok &= sym(h, "H5Gopen2", &api.H5Gopen2);
  ok &= sym(h, "H5Gclose", &api.H5Gclose);
  ok &= sym(h, "H5Aexists", &api.H5Aexists);
  ok &= sym(h, "H5Aopen", &api.H5Aopen);
  ok &= sym(h, "H5Aget_type", &api.H5Aget_type);
  ok &= sym(h, "H5Aread", &api.H5Aread);
  ok &= sym(h, "H5Aclose", &api.H5Aclose);
  ok &= sym(h, "H5Literate2", &api.H5Literate2);
  ok &= sym(h, "H5free_memory", &api.H5free_memory);
  ok &= sym(h, "H5Tget_cset", &api.H5Tget_cset);
  ok &= sym(h, "H5Tset_cset", &api.H5Tset_cset);
  ok &= sym(h, "H5T_NATIVE_DOUBLE_g", &api.native_double);
  ok &= sym(h, "H5T_NATIVE_FLOAT_g", &api.native_float);
  ok &= sym(h, "H5T_NATIVE_INT_g", &api.native_int);
  ok &= sym(h, "H5T_NATIVE_SHORT_g", &api.native_short);
  ok &= sym(h, "H5T_C_S1_g", &api.c_s1);
  if (!ok) { dlclose(h); return false; }
  if (api.H5open() < 0) { dlclose(h); return false; }
  api.H5Eset_auto2(0, nullptr, nullptr);   // silence stderr spew
  api.handle = h;
  api.ok = true;
  return true;
}

// per-event mem layout the compound read converts into
struct EventRec {
  double start;
  double length;
  float mean;
  float stdv;
  int32_t move;
  char state[8];       // first state_size bytes valid
};

struct FirstChild {
  char name[256];
  bool found = false;
};

herr_t_ first_child_cb(hid_t_, const char* name, const void*, void* data) {
  FirstChild* fc = static_cast<FirstChild*>(data);
  std::snprintf(fc->name, sizeof(fc->name), "%s", name);
  fc->found = true;
  return 1;  // stop after the first (name-ordered) link, like items()[0]
}

// reads the version attribute as text; empty when missing
bool read_version(hid_t_ grp, std::string* out) {
  out->clear();
  if (api.H5Aexists(grp, "version") <= 0) return false;
  hid_t_ attr = api.H5Aopen(grp, "version", 0);
  if (attr < 0) return false;
  hid_t_ ftype = api.H5Aget_type(attr);
  bool got = false;
  if (api.H5Tis_variable_str(ftype) > 0) {
    hid_t_ mtype = api.H5Tcopy(*api.c_s1);
    api.H5Tset_size(mtype, size_t(-1));     // H5T_VARIABLE
    api.H5Tset_cset(mtype, api.H5Tget_cset(ftype));  // match file charset
    char* p = nullptr;
    if (api.H5Aread(attr, mtype, &p) >= 0 && p) {
      out->assign(p);
      api.H5free_memory(p);
      got = true;
    }
    api.H5Tclose(mtype);
  } else {
    size_t n = api.H5Tget_size(ftype);
    if (n > 0 && n < 4096) {
      std::vector<char> buf(n + 1, 0);
      hid_t_ mtype = api.H5Tcopy(*api.c_s1);
      api.H5Tset_size(mtype, n);
      api.H5Tset_cset(mtype, api.H5Tget_cset(ftype));
      if (api.H5Aread(attr, mtype, buf.data()) >= 0) {
        out->assign(buf.data(), strnlen(buf.data(), n));
        got = true;
      }
      api.H5Tclose(mtype);
    }
  }
  api.H5Tclose(ftype);
  api.H5Aclose(attr);
  return got;
}

// io/fast5._version_leq_zero semantics
bool version_leq_zero(const std::string& text, bool present) {
  if (!present) return true;
  std::vector<long> parts;
  size_t i = 0;
  while (i <= text.size()) {
    std::string num;
    while (i < text.size() && text[i] >= '0' && text[i] <= '9') num += text[i++];
    if (num.empty()) break;
    parts.push_back(std::stol(num));
    // advance past the non-digit remainder of this token up to the next dot
    if (i < text.size() && text[i] != '.') break;
    if (i < text.size()) ++i; else break;
  }
  if (parts.empty()) return true;
  for (long p : parts) if (p != 0) return false;
  return true;
}

}  // namespace h5

extern "C" {

int nr_hdf5_init(const char* libpath) { return h5::init(libpath) ? 0 : -1; }

// Decode + compact one single-read fast5. Returns n_bases >= 2, or:
//   -1 invalid args / hdf5 not initialized   -2 output capacity exceeded
//   -3 open/read failure                     -4 events too short / zero moves
//   -5 signal shorter than events
int64_t nr_fast5_compact(
    const char* path,
    const char* events_path,      // "/Analyses/<g>/<sg>/Events"
    const char* group_path,       // "/Analyses/<g>" (version attr)
    int qlen,
    uint8_t* bases_out, int64_t bases_cap,
    double* shift_io, double* scale_io,
    int16_t* csig_out, int64_t csig_cap,
    int32_t* pos0_out, uint8_t* vlen_out, uint16_t* feats_out,
    int64_t* m_out) {
  using h5::api;
  if (!api.ok || qlen < 2 || qlen > 255) return -1;

  hid_t_ file = api.H5Fopen(path, 0 /*RDONLY*/, 0);
  if (file < 0) return -3;

  struct Closer {
    hid_t_ file;
    ~Closer() { h5::api.H5Fclose(file); }
  } closer{file};

  // ---- events table ----
  hid_t_ dset = api.H5Dopen2(file, events_path, 0);
  if (dset < 0) return -3;
  hid_t_ space = api.H5Dget_space(dset);
  const int64_t n_ev = api.H5Sget_simple_extent_npoints(space);
  api.H5Sclose(space);
  if (n_ev < 1) { api.H5Dclose(dset); return -4; }

  // state string size from the file type
  hid_t_ ftype = api.H5Dget_type(dset);
  size_t state_size = 5;
  {
    int nm = api.H5Tget_nmembers(ftype);
    for (int k = 0; k < nm; ++k) {
      char* name = api.H5Tget_member_name(ftype, unsigned(k));
      if (name && std::strcmp(name, "model_state") == 0) {
        hid_t_ mt = api.H5Tget_member_type(ftype, unsigned(k));
        state_size = api.H5Tget_size(mt);
        api.H5Tclose(mt);
      }
      if (name) api.H5free_memory(name);
    }
  }
  api.H5Tclose(ftype);
  if (state_size < 3 || state_size > 8) { api.H5Dclose(dset); return -3; }

  hid_t_ stype = api.H5Tcopy(*api.c_s1);
  api.H5Tset_size(stype, state_size);
  hid_t_ mtype = api.H5Tcreate(6 /*H5T_COMPOUND*/, sizeof(h5::EventRec));
  api.H5Tinsert(mtype, "start", offsetof(h5::EventRec, start), *api.native_double);
  api.H5Tinsert(mtype, "length", offsetof(h5::EventRec, length), *api.native_double);
  api.H5Tinsert(mtype, "mean", offsetof(h5::EventRec, mean), *api.native_float);
  api.H5Tinsert(mtype, "stdv", offsetof(h5::EventRec, stdv), *api.native_float);
  api.H5Tinsert(mtype, "move", offsetof(h5::EventRec, move), *api.native_int);
  api.H5Tinsert(mtype, "model_state", offsetof(h5::EventRec, state), stype);

  std::vector<h5::EventRec> ev(static_cast<size_t>(n_ev));
  herr_t_ rc = api.H5Dread(dset, mtype, 0, 0, 0, ev.data());
  api.H5Tclose(mtype);
  api.H5Tclose(stype);
  api.H5Dclose(dset);
  if (rc < 0) return -3;

  // ---- legacy seconds rescale (version <= 0.0) ----
  bool legacy = true;
  {
    hid_t_ grp = api.H5Gopen2(file, group_path, 0);
    if (grp >= 0) {
      std::string ver;
      bool present = h5::read_version(grp, &ver);
      legacy = h5::version_leq_zero(ver, present);
      api.H5Gclose(grp);
    }
  }

  // ---- first read under /Raw/Reads ----
  hid_t_ raw = api.H5Gopen2(file, "/Raw/Reads", 0);
  if (raw < 0) return -3;
  h5::FirstChild fc;
  hsize_t_ idx = 0;
  api.H5Literate2(raw, 0 /*H5_INDEX_NAME*/, 0 /*H5_ITER_INC*/, &idx,
                  h5::first_child_cb, &fc);
  if (!fc.found) { api.H5Gclose(raw); return -3; }

  if (legacy) {
    hid_t_ rg = api.H5Gopen2(raw, fc.name, 0);
    double start_time = 0.0;
    if (rg >= 0) {
      if (api.H5Aexists(rg, "start_time") > 0) {
        hid_t_ a = api.H5Aopen(rg, "start_time", 0);
        if (a >= 0) {
          api.H5Aread(a, *api.native_double, &start_time);
          api.H5Aclose(a);
        }
      }
      api.H5Gclose(rg);
    }
    for (auto& e : ev) {
      e.start = e.start * 4000.0 - start_time;
      e.length = e.length * 4000.0;
    }
  }

  // ---- signal ----
  std::string sig_path = std::string("/Raw/Reads/") + fc.name + "/Signal";
  api.H5Gclose(raw);
  hid_t_ sd = api.H5Dopen2(file, sig_path.c_str(), 0);
  if (sd < 0) return -3;
  hid_t_ ss = api.H5Dget_space(sd);
  const int64_t n_sig = api.H5Sget_simple_extent_npoints(ss);
  api.H5Sclose(ss);
  std::vector<int16_t> sig(static_cast<size_t>(std::max<int64_t>(n_sig, 1)));
  rc = api.H5Dread(sd, *api.native_short, 0, 0, 0, sig.data());
  api.H5Dclose(sd);
  if (rc < 0 || n_sig < 1) return -3;

  // ---- move-semantics decode (io/fast5.decode_events) ----
  int64_t total = 0;
  for (auto& e : ev) total += (e.move == 0) ? 0 : ((e.move == 2) ? 2 : 1);
  if (total < 2) return -4;
  if (total > bases_cap) return -2;

  std::vector<int64_t> starts_abs(static_cast<size_t>(total));
  std::vector<double> durations(static_cast<size_t>(total));
  std::vector<float> abm(static_cast<size_t>(total)), absd(static_cast<size_t>(total));
  int64_t k = 0;
  for (auto& e : ev) {
    if (e.move == 0) continue;
    const int64_t st = int64_t(e.start);     // trunc, numpy astype semantics
    if (e.move == 2) {
      starts_abs[k] = st;      bases_out[k] = uint8_t(e.state[1]);
      abm[k] = e.mean; absd[k] = e.stdv; ++k;
      starts_abs[k] = st + 2;  bases_out[k] = uint8_t(e.state[2]);
      abm[k] = e.mean; absd[k] = e.stdv; ++k;
    } else {
      starts_abs[k] = st;      bases_out[k] = uint8_t(e.state[2]);
      abm[k] = e.mean; absd[k] = e.stdv; ++k;
    }
  }

  for (int64_t i = 0; i + 1 < total; ++i)
    durations[i] = double(starts_abs[i + 1] - starts_abs[i]);
  durations[total - 1] =
      (starts_abs[total - 1] - starts_abs[total - 2] < 5) ? 3.0 : 5.0;

  if (n_sig < starts_abs[total - 1] + int64_t(durations[total - 1]))
    return -5;

  // ---- compaction on the tail ----
  const int64_t rsr = starts_abs[0];
  std::vector<int32_t> starts_rel(static_cast<size_t>(total));
  for (int64_t i = 0; i < total; ++i)
    starts_rel[i] = int32_t(starts_abs[i] - rsr);
  const int16_t* tail = sig.data() + rsr;
  const int64_t n_tail = n_sig - rsr;
  if (n_tail < 1) return -3;

  if (*shift_io <= -1e30) mad_core(tail, n_tail, shift_io, scale_io);
  int64_t m = compact_core(tail, n_tail, starts_rel.data(), total, bases_out,
                           durations.data(), abm.data(), absd.data(), qlen,
                           *shift_io, *scale_io, csig_out, csig_cap,
                           pos0_out, vlen_out, feats_out);
  if (m < 0) return m;
  *m_out = m;
  return total;
}


}  // extern "C"


extern "C" {

// Wire-encode a compacted read (infer/wire.py encode_read semantics,
// bit-exact — parity asserted in tests/test_native.py):
//   sig8      : zig-zag deltas, 255 = escape; sig8[0] always 255
//   posd      : pos0 row deltas (posd[0] = 0 placeholder)
//   evf       : f16 bits of feats columns [1,2,4,5]
//   codes     : 2-bit base code (A=0,G=1,T=2,C=3; else 0 + color escape)
//   dur esc   : rows where DUR_TABLE[pos delta] != feats[:,3] plus the
//               last row (whose device-derived delta is the next read's)
// Returns 0, or: -2 escape capacity exceeded, -6 pos0 delta outside
// [0, 50].
int64_t nr_encode_wire(
    const int16_t* csig, int64_t m,
    const int32_t* pos0, const uint8_t* vlen,
    const uint16_t* feats /* [n,6] f16 bits */, const uint8_t* bases,
    int64_t n,
    uint8_t* sig8, int32_t* sig_esc_idx, int32_t* sig_esc_delta,
    int64_t esc_cap,
    uint8_t* posd, uint16_t* evf /* [n,4] */, uint8_t* codes,
    int32_t* dur_esc_idx, float* dur_esc_f32, int64_t dur_cap,
    int32_t* vlen_esc_idx, int32_t* vlen_esc_val, int64_t vl_cap,
    int32_t* col_esc_idx, int64_t col_cap,
    int64_t* counts_out /* [4]: ne, nd, nv, nc */) {
  if (m < 1 || n < 1) return -1;

  static uint16_t dur_tab[256];
  static bool dur_init = false;
  if (!dur_init) {
    for (int i = 0; i < 256; ++i) dur_tab[i] = f64_to_f16(double(i) * 0.1);
    dur_init = true;
  }
  int8_t code_of[256];
  std::memset(code_of, -1, sizeof(code_of));
  code_of['A'] = 0; code_of['G'] = 1; code_of['T'] = 2; code_of['C'] = 3;

  // signal: zig-zag deltas with escapes
  int64_t ne = 0;
  sig8[0] = 255;
  for (int64_t i = 1; i < m; ++i) {
    const int32_t d = int32_t(csig[i]) - int32_t(csig[i - 1]);
    const uint32_t z = uint32_t((d << 1) ^ (d >> 31));
    if (z >= 255u) {
      if (ne >= esc_cap) return -2;
      sig8[i] = 255;
      sig_esc_idx[ne] = int32_t(i);
      sig_esc_delta[ne] = d;
      ++ne;
    } else {
      sig8[i] = uint8_t(z);
    }
  }

  // pos deltas + vlen/dur/col escapes + codes + evf, one pass over rows
  int64_t nd = 0, nv = 0, nc = 0;
  posd[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t pd = 0;
    if (i + 1 < n) {
      pd = pos0[i + 1] - pos0[i];
      if (pd < 0 || pd > 50) return -6;
      posd[i + 1] = uint8_t(pd);
    }
    const uint16_t* fr = feats + i * 6;
    const bool last = (i + 1 == n);
    if (last || dur_tab[pd] != fr[3]) {
      if (nd >= dur_cap) return -2;
      dur_esc_idx[nd] = int32_t(i);
      dur_esc_f32[nd] = _cvtsh_ss(fr[3]);
      ++nd;
    }
    if (vlen[i] != 50) {
      if (nv >= vl_cap) return -2;
      vlen_esc_idx[nv] = int32_t(i);
      vlen_esc_val[nv] = int32_t(vlen[i]);
      ++nv;
    }
    const int8_t c = code_of[bases[i]];
    if (c < 0) {
      if (nc >= col_cap) return -2;
      col_esc_idx[nc] = int32_t(i);
      ++nc;
      codes[i] = 0;
    } else {
      codes[i] = uint8_t(c);
    }
    uint16_t* er = evf + i * 4;
    er[0] = fr[1]; er[1] = fr[2]; er[2] = fr[4]; er[3] = fr[5];
  }
  counts_out[0] = ne; counts_out[1] = nd;
  counts_out[2] = nv; counts_out[3] = nc;
  return 0;
}

}  // extern "C"
