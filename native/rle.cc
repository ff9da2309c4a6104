// Fast COCO RLE codec — native backend for upsnet_tpu.evaluation.rle.
//
// The reference leans on pycocotools' C maskUtils for the eval-time mask
// hot path (SURVEY.md §2.4); this is the equivalent native component here:
// run-length encode/decode of column-major binary masks, the pycocotools
// 5-bit LEB string format, and RLE-domain intersection/area (no dense
// decode) for mask IoU.
//
// C ABI only — consumed from Python via ctypes (no pybind11 dependency).
// Build: `make -C native` -> librle.so.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode a column-major (Fortran-order flattened) binary mask to run counts.
// mask: h*w bytes (0/1), counts_out: caller-allocated, at least h*w+1 longs.
// Returns the number of counts written.
int64_t rle_encode_counts(const uint8_t* mask, int64_t n, int64_t* counts_out) {
  int64_t m = 0;
  uint8_t cur = 0;  // counts start with the zero-run
  int64_t run = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (mask[i] != cur) {
      counts_out[m++] = run;
      run = 0;
      cur = mask[i];
    }
    ++run;
  }
  counts_out[m++] = run;
  return m;
}

// Decode run counts into a column-major binary mask buffer of size n.
void rle_decode_counts(const int64_t* counts, int64_t m, uint8_t* mask_out,
                       int64_t n) {
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t i = 0; i < m && pos < n; ++i) {
    int64_t c = counts[i];
    if (c > n - pos) c = n - pos;
    if (val) memset(mask_out + pos, 1, (size_t)c);
    pos += c;
    val ^= 1;
  }
}

// pycocotools-compatible LEB-style string encoding (delta from 4th count).
// out must hold at least m*7 bytes. Returns encoded length.
int64_t rle_counts_to_string(const int64_t* counts, int64_t m, char* out) {
  int64_t p = 0;
  for (int64_t i = 0; i < m; ++i) {
    long long x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      char c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      out[p++] = c + 48;
    }
  }
  return p;
}

// Decode the string form. counts_out sized >= len. Returns count of counts.
int64_t rle_string_to_counts(const char* s, int64_t len, int64_t* counts_out) {
  int64_t m = 0, p = 0;
  while (p < len) {
    long long x = 0;
    int k = 0;
    bool more = true;
    char c = 0;
    while (more) {
      c = s[p] - 48;
      x |= (long long)(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (m > 2) x += counts_out[m - 2];
    counts_out[m++] = x;
  }
  return m;
}

// Sum of 1-runs (mask area) from counts.
int64_t rle_area(const int64_t* counts, int64_t m) {
  int64_t a = 0;
  for (int64_t i = 1; i < m; i += 2) a += counts[i];
  return a;
}

// Intersection area of two RLEs (merge of 1-run interval lists).
int64_t rle_intersection(const int64_t* ca, int64_t ma, const int64_t* cb,
                         int64_t mb) {
  int64_t inter = 0;
  int64_t ia = 1, ib = 1;  // index of current 1-run count
  int64_t sa = ca[0], sb = cb[0];
  while (ia < ma && ib < mb) {
    int64_t ea = sa + ca[ia];
    int64_t eb = sb + cb[ib];
    int64_t lo = sa > sb ? sa : sb;
    int64_t hi = ea < eb ? ea : eb;
    if (hi > lo) inter += hi - lo;
    if (ea < eb) {
      sa = ea + (ia + 1 < ma ? ca[ia + 1] : 0);
      ia += 2;
    } else {
      sb = eb + (ib + 1 < mb ? cb[ib + 1] : 0);
      ib += 2;
    }
  }
  return inter;
}

}  // extern "C"
