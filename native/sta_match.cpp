// Native STA greedy matcher.
//
// The per-image matching loop of the Ego4D STA evaluator
// (transfusion_tpu/metrics/sta_map.py::add) is the hot host-side path during
// validation: ~100 score-sorted predictions x 8 measures x every val image,
// between device steps on a single host core. This implements the identical
// semantics (+1-pixel IoU, candidate masks per measure, per-measure gt
// exclusivity, ties resolved by descending-index order for equal scores) in
// C++, exposed via a C ABI for ctypes.
//
// Build: make -C native   (produces libsta_match.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

constexpr int kNumMeasures = 8;

inline double area1(const double* b) {
  double w = b[2] - b[0] + 1.0;
  double h = b[3] - b[1] + 1.0;
  if (w < 0) w = 0;
  if (h < 0) h = 0;
  return w * h;
}

inline double iou_plus_one(const double* a, const double* b) {
  double ix1 = std::max(a[0], b[0]);
  double iy1 = std::max(a[1], b[1]);
  double ix2 = std::min(a[2], b[2]);
  double iy2 = std::min(a[3], b[3]);
  double iw = ix2 - ix1 + 1.0;
  double ih = iy2 - iy1 + 1.0;
  if (iw < 0) iw = 0;
  if (ih < 0) ih = 0;
  double inter = iw * ih;
  return inter / (area1(a) + area1(b) - inter + 1e-11);
}

}  // namespace

extern "C" {

// tp_out: [n_pred * 8], row-major, caller-zeroed.
void sta_match(const double* pred_boxes, const double* scores,
               const double* pred_nouns, const double* pred_verbs,
               const double* pred_ttcs, int n_pred,
               const double* gt_boxes, const double* gt_nouns,
               const double* gt_verbs, const double* gt_ttcs, int n_gt,
               double iou_threshold, double ttc_threshold, double* tp_out) {
  if (n_gt <= 0 || n_pred <= 0) return;

  std::vector<double> ious(static_cast<size_t>(n_pred) * n_gt);
  for (int i = 0; i < n_pred; ++i)
    for (int g = 0; g < n_gt; ++g)
      ious[i * n_gt + g] = iou_plus_one(pred_boxes + 4 * i, gt_boxes + 4 * g);

  // Score order: descending; ties in reverse input order (argsort[::-1]).
  std::vector<int> order(n_pred);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] < scores[b]; });
  std::reverse(order.begin(), order.end());

  std::vector<uint8_t> gt_taken(static_cast<size_t>(n_gt) * kNumMeasures, 0);
  bool cand[kNumMeasures];

  for (int oi = 0; oi < n_pred; ++oi) {
    int i = order[oi];
    double best_ov[kNumMeasures];
    int best_gt[kNumMeasures];
    for (int m = 0; m < kNumMeasures; ++m) {
      best_ov[m] = -1.0;
      best_gt[m] = 0;
    }
    for (int g = 0; g < n_gt; ++g) {
      double ov = ious[i * n_gt + g];
      bool noun = pred_nouns[i] == gt_nouns[g];
      bool box = ov > iou_threshold;
      bool verb = pred_verbs[i] == gt_verbs[g];
      bool ttc = std::fabs(pred_ttcs[i] - gt_ttcs[g]) <= ttc_threshold;
      cand[0] = noun;
      cand[1] = verb;
      cand[2] = box;
      cand[3] = box && noun;
      cand[4] = box && noun && verb;
      cand[5] = box && noun && ttc;
      cand[6] = box && noun && verb && ttc;
      cand[7] = ttc;
      for (int m = 0; m < kNumMeasures; ++m) {
        if (cand[m] && !gt_taken[g * kNumMeasures + m] && ov > best_ov[m]) {
          best_ov[m] = ov;
          best_gt[m] = g;
        }
      }
    }
    for (int m = 0; m < kNumMeasures; ++m) {
      if (best_ov[m] > -1.0) {
        tp_out[i * kNumMeasures + m] = 1.0;
        gt_taken[best_gt[m] * kNumMeasures + m] = 1;
      }
    }
  }
}

}  // extern "C"
