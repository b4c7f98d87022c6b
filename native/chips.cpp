// Native greedy set-cover kernel for SNIPER chip generation.
//
// TPU-native rebuild of the reference C++ chip kernel
// (/root/reference/lib/chips/cchips.cpp:54-177) as a standalone shared
// library consumed via ctypes (no Cython). Unlike the reference, candidate
// enumeration, clipping and shuffling stay on the Python side (vectorized
// NumPy); this kernel does only the hot part: containment testing + greedy
// max-cover over bitsets (uint64 words, popcount), which is O(rounds * C *
// N/64) instead of the reference's std::set_difference over int sets.
//
// Build: scripts/build_native.sh -> native/libsniper_chips.so

#include <cstddef>
#include <cstdint>
#include <vector>

#if defined(__GNUC__)
#define POPCOUNT64 __builtin_popcountll
#else
static inline int POPCOUNT64(uint64_t x) {
  int c = 0;
  while (x) { x &= x - 1; ++c; }
  return c;
}
#endif

extern "C" {

// cands: [C,4] xyxy, boxes: [N,4] xyxy (pre-clipped). A box is contained
// in a candidate iff its legacy (+1) intersection area equals its own
// (+1) area, i.e. the candidate fully contains it.
// out: picked candidate indices (caller-allocated, size >= C).
// Returns the number of picked candidates.
int sniper_greedy_cover(const double* cands, int C, const double* boxes,
                        int N, int* out) {
  if (C <= 0 || N <= 0) return 0;
  const int W = (N + 63) / 64;
  std::vector<uint64_t> contain((std::size_t)C * W, 0);

  for (int c = 0; c < C; ++c) {
    const double cx1 = cands[4 * c], cy1 = cands[4 * c + 1];
    const double cx2 = cands[4 * c + 2], cy2 = cands[4 * c + 3];
    uint64_t* row = &contain[(std::size_t)c * W];
    for (int n = 0; n < N; ++n) {
      const double bx1 = boxes[4 * n], by1 = boxes[4 * n + 1];
      const double bx2 = boxes[4 * n + 2], by2 = boxes[4 * n + 3];
      if (bx1 >= cx1 && by1 >= cy1 && bx2 <= cx2 && by2 <= cy2)
        row[n >> 6] |= (uint64_t(1) << (n & 63));
    }
  }

  std::vector<uint64_t> uncovered(W, ~uint64_t(0));
  if (N & 63) uncovered[W - 1] = (uint64_t(1) << (N & 63)) - 1;

  int n_picked = 0;
  while (true) {
    int best = -1, best_count = 0;
    for (int c = 0; c < C; ++c) {
      const uint64_t* row = &contain[(std::size_t)c * W];
      int cnt = 0;
      for (int w = 0; w < W; ++w) cnt += POPCOUNT64(row[w] & uncovered[w]);
      if (cnt > best_count) { best_count = cnt; best = c; }
    }
    if (best < 0) break;
    const uint64_t* row = &contain[(std::size_t)best * W];
    for (int w = 0; w < W; ++w) uncovered[w] &= ~row[w];
    out[n_picked++] = best;
  }
  return n_picked;
}

}  // extern "C"
