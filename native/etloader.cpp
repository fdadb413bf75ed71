// Native ETH-UCY trajectory preprocessing.
//
// Implements the reference's TrajectoryDataset windowing semantics
// (/root/reference/utils/dataloader.py:158-232) in C++: parse `frame ped x y`
// text files, build sliding windows of obs_len+pred_len frames, keep only
// fully-observed pedestrians, round to 4 decimals (half-to-even, matching
// numpy.around), filter scenes with <= min_ped peds, and flag non-linear
// trajectories via a quadratic least-squares residual (dataloader.py:136-151).
//
// This is the framework's hot host-side loop (the Python version takes tens of
// seconds on the larger splits); exposed through a plain C ABI for ctypes.
//
// Build: make -C native   (produces libetloader.so)

#include <cfenv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

struct Row {
  double frame, ped, x, y;
};

// numpy.around(x, 4): scale, round-half-even, unscale.
double round4(double v) {
  return std::nearbyint(v * 10000.0) / 10000.0;  // FE_TONEAREST default
}

// Quadratic least-squares residual (sum of squared errors) of y over
// t = 0..n-1, mirroring np.polyfit(t, y, 2, full=True)[1].
double quad_residual(const double* y, int n) {
  // Normal equations for basis {1, t, t^2}.
  double s[5] = {0, 0, 0, 0, 0};  // sum t^0..t^4
  double b[3] = {0, 0, 0};        // sum y*t^0..t^2
  for (int i = 0; i < n; ++i) {
    double t = static_cast<double>(i), tp = 1.0;
    for (int k = 0; k < 5; ++k) {
      s[k] += tp;
      if (k < 3) b[k] += y[i] * tp;
      tp *= t;
    }
  }
  double a[3][4] = {{s[0], s[1], s[2], b[0]},
                    {s[1], s[2], s[3], b[1]},
                    {s[2], s[3], s[4], b[2]}};
  // Gaussian elimination with partial pivoting.
  for (int c = 0; c < 3; ++c) {
    int piv = c;
    for (int r = c + 1; r < 3; ++r)
      if (std::fabs(a[r][c]) > std::fabs(a[piv][c])) piv = r;
    if (piv != c)
      for (int k = 0; k < 4; ++k) std::swap(a[c][k], a[piv][k]);
    for (int r = c + 1; r < 3; ++r) {
      double f = a[r][c] / a[c][c];
      for (int k = c; k < 4; ++k) a[r][k] -= f * a[c][k];
    }
  }
  double coef[3];
  for (int c = 2; c >= 0; --c) {
    double v = a[c][3];
    for (int k = c + 1; k < 3; ++k) v -= a[c][k] * coef[k];
    coef[c] = v / a[c][c];
  }
  double resid = 0.0;
  for (int i = 0; i < n; ++i) {
    double t = static_cast<double>(i);
    double fit = coef[0] + coef[1] * t + coef[2] * t * t;
    double d = y[i] - fit;
    resid += d * d;
  }
  return resid;
}

struct Result {
  std::vector<double> seq;        // n_peds * seq_len * 2, NTC layout
  std::vector<double> loss_mask;  // n_peds * seq_len
  std::vector<double> nonlinear;  // n_peds
  std::vector<int32_t> peds_per_scene;
};

bool parse_file(const char* path, std::vector<Row>* rows) {
  FILE* f = std::fopen(path, "r");
  if (!f) return false;
  char line[512];
  while (std::fgets(line, sizeof line, f)) {
    Row r;
    char* p = line;
    char* end;
    r.frame = std::strtod(p, &end);
    if (end == p) continue;
    p = end;
    r.ped = std::strtod(p, &end);
    p = end;
    r.x = std::strtod(p, &end);
    p = end;
    r.y = std::strtod(p, &end);
    rows->push_back(r);
  }
  std::fclose(f);
  return true;
}

void process_file(const std::vector<Row>& rows, int obs_len, int pred_len,
                  int skip, double threshold, int min_ped, Result* out) {
  const int seq_len = obs_len + pred_len;

  // unique frames, sorted (np.unique), with index lookup (frames.index)
  std::map<double, int> frame_index;
  for (const Row& r : rows) frame_index.emplace(r.frame, 0);
  std::vector<double> frames;
  frames.reserve(frame_index.size());
  for (auto& kv : frame_index) {
    kv.second = static_cast<int>(frames.size());
    frames.push_back(kv.first);
  }
  const int n_frames = static_cast<int>(frames.size());

  // rows grouped per frame, preserving original file order within a frame
  std::vector<std::vector<Row>> frame_data(n_frames);
  for (const Row& r : rows) frame_data[frame_index[r.frame]].push_back(r);

  int num_sequences =
      static_cast<int>(std::ceil((n_frames - seq_len + 1) / double(skip)));

  for (int idx = 0; idx < num_sequences * skip + 1; idx += skip) {
    // concatenate rows of frames [idx, idx+seq_len)
    std::vector<Row> window;
    for (int t = idx; t < idx + seq_len && t < n_frames; ++t)
      window.insert(window.end(), frame_data[t].begin(), frame_data[t].end());
    if (window.empty()) continue;

    // unique ped ids, ascending (np.unique)
    std::map<double, bool> ped_set;
    for (const Row& r : window) ped_set.emplace(r.ped, true);

    std::vector<double> cur_seq;   // per considered ped: 2 * seq_len (CT)
    std::vector<double> cur_mask;  // per considered ped: seq_len
    std::vector<double> cur_nl;
    int considered = 0;

    for (const auto& kv : ped_set) {
      const double ped_id = kv.first;
      std::vector<double> xs, ys;
      double first_frame = 0, last_frame = 0;
      bool first = true;
      for (const Row& r : window) {
        if (r.ped == ped_id) {
          if (first) first_frame = r.frame, first = false;
          last_frame = r.frame;
          xs.push_back(round4(r.x));
          ys.push_back(round4(r.y));
        }
      }
      const int pad_front = frame_index[first_frame] - idx;
      const int pad_end = frame_index[last_frame] - idx + 1;
      if (pad_end - pad_front != seq_len) continue;

      cur_seq.resize(cur_seq.size() + 2 * seq_len, 0.0);
      cur_mask.resize(cur_mask.size() + seq_len, 0.0);
      double* sx = &cur_seq[cur_seq.size() - 2 * seq_len];
      double* sy = sx + seq_len;
      double* m = &cur_mask[cur_mask.size() - seq_len];
      for (size_t t = 0; t < xs.size() && static_cast<int>(t) < seq_len; ++t) {
        sx[pad_front + t] = xs[t];
        sy[pad_front + t] = ys[t];
        m[pad_front + t] = 1.0;
      }
      // non-linearity over the last pred_len steps (dataloader.py:136-151)
      const int off = static_cast<int>(xs.size()) - pred_len;
      const double res =
          quad_residual(&xs[off], pred_len) + quad_residual(&ys[off], pred_len);
      cur_nl.push_back(res >= threshold ? 1.0 : 0.0);
      ++considered;
    }

    if (considered > min_ped) {
      out->peds_per_scene.push_back(considered);
      out->seq.insert(out->seq.end(), cur_seq.begin(), cur_seq.end());
      out->loss_mask.insert(out->loss_mask.end(), cur_mask.begin(), cur_mask.end());
      out->nonlinear.insert(out->nonlinear.end(), cur_nl.begin(), cur_nl.end());
    }
  }
}

}  // namespace

extern "C" {

struct ETLoadResult {
  double* seq;            // n_peds x 2 x seq_len (CT layout per ped)
  double* loss_mask;      // n_peds x seq_len
  double* nonlinear;      // n_peds
  int32_t* peds_per_scene;  // n_scenes
  int32_t n_peds;
  int32_t n_scenes;
};

int et_load_split(const char** paths, int n_paths, int obs_len, int pred_len,
                  int skip, double threshold, int min_ped, ETLoadResult* out) {
  Result res;
  for (int i = 0; i < n_paths; ++i) {
    std::vector<Row> rows;
    if (!parse_file(paths[i], &rows)) return -1;
    process_file(rows, obs_len, pred_len, skip, threshold, min_ped, &res);
  }
  const int seq_len = obs_len + pred_len;
  out->n_peds = static_cast<int32_t>(res.nonlinear.size());
  out->n_scenes = static_cast<int32_t>(res.peds_per_scene.size());
  out->seq = static_cast<double*>(std::malloc(res.seq.size() * sizeof(double)));
  out->loss_mask =
      static_cast<double*>(std::malloc(res.loss_mask.size() * sizeof(double)));
  out->nonlinear =
      static_cast<double*>(std::malloc(res.nonlinear.size() * sizeof(double)));
  out->peds_per_scene = static_cast<int32_t*>(
      std::malloc(res.peds_per_scene.size() * sizeof(int32_t)));
  if (!out->seq || !out->loss_mask || !out->nonlinear || !out->peds_per_scene)
    return -2;
  std::memcpy(out->seq, res.seq.data(), res.seq.size() * sizeof(double));
  std::memcpy(out->loss_mask, res.loss_mask.data(),
              res.loss_mask.size() * sizeof(double));
  std::memcpy(out->nonlinear, res.nonlinear.data(),
              res.nonlinear.size() * sizeof(double));
  std::memcpy(out->peds_per_scene, res.peds_per_scene.data(),
              res.peds_per_scene.size() * sizeof(int32_t));
  (void)seq_len;
  return 0;
}

void et_free_result(ETLoadResult* r) {
  std::free(r->seq);
  std::free(r->loss_mask);
  std::free(r->nonlinear);
  std::free(r->peds_per_scene);
  r->seq = r->loss_mask = r->nonlinear = nullptr;
  r->peds_per_scene = nullptr;
}

}  // extern "C"
