// Host-side native ops for nerf_projects_tpu.
//
// The reference keeps its performance-critical host/runtime pieces native
// (CUDA/C++: svox2 csrc, svox _C). On TPU the device compute lives in
// XLA/Pallas; these are the host-side equivalents that are Python-loop
// bound in pure Python:
//   * octree_leaf_geometry — per-node depth/corner/size walk used by
//     extraction step2 and grid export (models/octree.py
//     leaf_depths_and_corners);
//   * median_cut — palette vector quantization for PlenOctree
//     compression (pipeline/compression.py; svox _C.quantize_median_cut
//     equivalent);
//   * build_neighbor_links — +x/+y/+z neighbor rows for TV
//     regularization (train/plenoxels_trainer.py).
//
// Plain C ABI for ctypes; no Python dependencies.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// child: [n_nodes, 8] int32 relative child offsets (cell order
// i*4+j*2+k); outputs sized n_nodes*8 (per cell): depth int32,
// corner float64[3], size float64. Leaf cells only are meaningful;
// is_leaf output marks them.
void octree_leaf_geometry(const int32_t* child, int64_t n_nodes,
                          int32_t* depth_out, double* corner_out,
                          double* size_out, uint8_t* is_leaf_out) {
  std::vector<int32_t> node_depth(n_nodes, 0);
  std::vector<double> node_corner(n_nodes * 3, 0.0);
  std::vector<double> node_size(n_nodes, 1.0);
  // children always have a higher index than their parent (append-only
  // refine), so one forward pass settles every node.
  for (int64_t node = 0; node < n_nodes; ++node) {
    for (int cell = 0; cell < 8; ++cell) {
      int32_t rel = child[node * 8 + cell];
      int64_t flat = node * 8 + cell;
      int i = (cell >> 2) & 1, j = (cell >> 1) & 1, k = cell & 1;
      double half = node_size[node] * 0.5;
      double cx = node_corner[node * 3 + 0] + i * half;
      double cy = node_corner[node * 3 + 1] + j * half;
      double cz = node_corner[node * 3 + 2] + k * half;
      if (rel != 0) {
        int64_t tgt = node + rel;
        node_depth[tgt] = node_depth[node] + 1;
        node_corner[tgt * 3 + 0] = cx;
        node_corner[tgt * 3 + 1] = cy;
        node_corner[tgt * 3 + 2] = cz;
        node_size[tgt] = half;
        is_leaf_out[flat] = 0;
      } else {
        is_leaf_out[flat] = 1;
      }
      depth_out[flat] = node_depth[node] + 1;
      corner_out[flat * 3 + 0] = cx;
      corner_out[flat * 3 + 1] = cy;
      corner_out[flat * 3 + 2] = cz;
      size_out[flat] = half;
    }
  }
}

// Median-cut vector quantization.
// vectors: [n, c] float32; ids_out: [n] int32; palette_out: [n_colors, c]
// float32. Returns the number of palette entries actually used.
int64_t median_cut(const float* vectors, int64_t n, int64_t c,
                   int64_t n_colors, int32_t* ids_out, float* palette_out) {
  if (n == 0) return 0;
  struct Box {
    std::vector<int64_t> idx;
    double score;  // max-range * count
    int axis;
  };
  auto eval_box = [&](Box& b) {
    if (b.idx.size() < 2) {
      b.score = 0.0;
      b.axis = 0;
      return;
    }
    double best_range = -1.0;
    int best_axis = 0;
    for (int64_t a = 0; a < c; ++a) {
      float lo = vectors[b.idx[0] * c + a], hi = lo;
      for (int64_t i : b.idx) {
        float v = vectors[i * c + a];
        lo = std::min(lo, v);
        hi = std::max(hi, v);
      }
      double r = double(hi) - double(lo);
      if (r > best_range) {
        best_range = r;
        best_axis = int(a);
      }
    }
    b.score = best_range * double(b.idx.size());
    b.axis = best_axis;
  };

  std::vector<Box> boxes;
  boxes.emplace_back();
  boxes[0].idx.resize(n);
  std::iota(boxes[0].idx.begin(), boxes[0].idx.end(), 0);
  eval_box(boxes[0]);

  while ((int64_t)boxes.size() < n_colors) {
    // pick the box with the largest score
    int64_t best = -1;
    double best_score = 0.0;
    for (int64_t b = 0; b < (int64_t)boxes.size(); ++b) {
      if (boxes[b].score > best_score) {
        best_score = boxes[b].score;
        best = b;
      }
    }
    if (best < 0) break;
    Box& src = boxes[best];
    int axis = src.axis;
    auto mid = src.idx.begin() + src.idx.size() / 2;
    std::nth_element(src.idx.begin(), mid, src.idx.end(),
                     [&](int64_t a, int64_t b) {
                       return vectors[a * c + axis] < vectors[b * c + axis];
                     });
    Box hi;
    hi.idx.assign(mid, src.idx.end());
    src.idx.erase(mid, src.idx.end());
    eval_box(src);
    eval_box(hi);
    boxes.push_back(std::move(hi));
  }

  int64_t k = (int64_t)boxes.size();
  for (int64_t b = 0; b < k; ++b) {
    const auto& idx = boxes[b].idx;
    std::vector<double> mean(c, 0.0);
    for (int64_t i : idx)
      for (int64_t a = 0; a < c; ++a) mean[a] += vectors[i * c + a];
    for (int64_t a = 0; a < c; ++a)
      palette_out[b * c + a] =
          idx.empty() ? 0.0f : float(mean[a] / double(idx.size()));
    for (int64_t i : idx) ids_out[i] = int32_t(b);
  }
  return k;
}

// +x/+y/+z neighbor compact rows for every active cell.
// links: [X*Y*Z] int32 (row-major); nbr_out: [cap, 3] int32 (-1 = none).
void build_neighbor_links(const int32_t* links, int64_t X, int64_t Y,
                          int64_t Z, int32_t* nbr_out, int64_t cap) {
  for (int64_t i = 0; i < cap * 3; ++i) nbr_out[i] = -1;
  for (int64_t x = 0; x < X; ++x)
    for (int64_t y = 0; y < Y; ++y)
      for (int64_t z = 0; z < Z; ++z) {
        int32_t row = links[(x * Y + y) * Z + z];
        if (row < 0) continue;
        if (x + 1 < X) nbr_out[row * 3 + 0] = links[((x + 1) * Y + y) * Z + z];
        if (y + 1 < Y) nbr_out[row * 3 + 1] = links[(x * Y + y + 1) * Z + z];
        if (z + 1 < Z) nbr_out[row * 3 + 2] = links[(x * Y + y) * Z + z + 1];
      }
}

}  // extern "C"
