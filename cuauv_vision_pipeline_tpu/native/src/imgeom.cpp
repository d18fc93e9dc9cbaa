// Host-side image geometry kernels for the Python utils layer.
//
// Moore-neighbor boundary tracing (Jacob's stopping criterion), a 1:1 native
// twin of utils/contours._trace_boundary.  The Python loop costs ~10 us per
// boundary pixel (it dominated the bins module's host leg after labeling was
// vectorized); this loop costs ~10 ns per boundary pixel.  Semantics are
// intentionally IDENTICAL to the Python tracer — the parity test
// (tests/test_utils_feature.py) runs both on random masks and requires
// bit-equal point lists, so the cv2-golden tests cover this path too.
//
// Parity target: cv2.findContours point sets (reference utils/feature.py
// wraps cv2; modules/bins.py + handlers consume the point lists).

#include <cstdint>
#include <cstddef>

namespace {

// Moore neighborhood in the same order as utils/contours._MOORE:
// (dx, dy) pairs — W, SW, S, SE, E, NE, N, NW in image coords (y down).
constexpr int MOORE_DX[8] = {-1, -1, 0, 1, 1, 1, 0, -1};
constexpr int MOORE_DY[8] = {0, 1, 1, 1, 0, -1, -1, -1};

inline int dir_index(int dx, int dy) {
  // Inverse of the _MOORE table ((dx,dy) in {-1,0,1}^2 \ {0,0}).
  for (int i = 0; i < 8; ++i)
    if (MOORE_DX[i] == dx && MOORE_DY[i] == dy) return i;
  return 0;  // unreachable for valid rel offsets
}

}  // namespace

extern "C" {

// Trace one boundary starting at (sy, sx) in the PADDED bool/uint8 mask
// fg[H][W] (border row/col must be 0, exactly like the np.pad(...) the
// Python caller applies).  start_dir is the Moore index of a KNOWN-bg
// neighbor of the start pixel: 0 (west) for outer boundaries started at a
// component's topmost-leftmost pixel, 2 (south) for hole boundaries started
// at the fg pixel just above the hole's topmost-leftmost pixel.
//
// out_xy receives (x, y) int32 pairs; max_pts bounds the OUTPUT length.
// Returns the number of points written, or -1 if the contour would exceed
// max_pts (caller retries with a bigger buffer).  The returned point list
// matches _trace_boundary exactly, including the trailing-point trim.
int64_t vp_trace_boundary(const uint8_t* fg, int64_t H, int64_t W,
                          int64_t sy, int64_t sx, int64_t start_dir,
                          int32_t* out_xy, int64_t max_pts) {
  (void)H;
  int64_t n = 0;  // points currently in out_xy
  if (max_pts < 1) return -1;
  out_xy[0] = (int32_t)sx;
  out_xy[1] = (int32_t)sy;
  n = 1;

  int prev_dir = (int)start_dir & 7;  // backtrack: bg neighbor we came from
  int64_t cy = sy, cx = sx;
  // Jacob's criterion state: the first (pixel, direction) move taken.
  bool have_first = false;
  int64_t first_y = 0, first_x = 0;
  int first_d = 0;

  const int64_t step_budget = 4 * H * W;
  for (int64_t step = 0; step < step_budget; ++step) {
    bool found = false;
    for (int k = 1; k <= 8; ++k) {
      const int d = (prev_dir + k) & 7;
      const int64_t ny = cy + MOORE_DY[d];
      const int64_t nx = cx + MOORE_DX[d];
      if (fg[ny * W + nx]) {
        // bg pixel checked just before this fg hit
        const int pd = (d + 7) & 7;
        const int64_t bg_y = cy + MOORE_DY[pd];
        const int64_t bg_x = cx + MOORE_DX[pd];
        // backtrack for the next pixel: direction new->that bg pixel
        const int idx = dir_index((int)(bg_x - nx), (int)(bg_y - ny));
        if (!have_first) {
          have_first = true;
          first_y = cy;
          first_x = cx;
          first_d = d;
        } else if (cy == sy && cx == sx && cy == first_y && cx == first_x &&
                   d == first_d) {
          return n - 1;  // closed: drop the duplicated start
        }
        cy = ny;
        cx = nx;
        if (n >= max_pts) return -1;
        out_xy[2 * n] = (int32_t)cx;
        out_xy[2 * n + 1] = (int32_t)cy;
        ++n;
        prev_dir = idx;
        found = true;
        break;
      }
    }
    if (!found) break;  // isolated pixel
  }
  return n > 1 ? n - 1 : n;
}

}  // extern "C"
