// Felzenszwalb-style graph segmentation over point/mesh neighborhood graphs.
//
// Native replacement for the reference's libs/pointseg (segmentor.cpp:
// union-find `universe`, `segment_graph`): used for ScanNet-style
// oversegmentation in instance-segmentation preprocessing.  Host-side C++
// (graph segmentation is inherently sequential union-find — not a TPU op);
// exposed through ctypes (pointcept_keypointdetection_tpu/ops/native.py).
//
// Build: cc -O2 -shared -fPIC pointseg.cpp -o libpointseg.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Edge {
  float w;
  int32_t a, b;
};

class UnionFind {
 public:
  explicit UnionFind(int32_t n) : parent_(n), rank_(n, 0), size_(n, 1), count_(n) {
    for (int32_t i = 0; i < n; ++i) parent_[i] = i;
  }

  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent_[root] != root) root = parent_[root];
    while (parent_[x] != root) {
      int32_t next = parent_[x];
      parent_[x] = root;
      x = next;
    }
    return root;
  }

  void join(int32_t x, int32_t y) {
    x = find(x);
    y = find(y);
    if (x == y) return;
    if (rank_[x] < rank_[y]) std::swap(x, y);
    parent_[y] = x;
    size_[x] += size_[y];
    if (rank_[x] == rank_[y]) ++rank_[x];
    --count_;
  }

  int32_t size(int32_t x) { return size_[find(x)]; }
  int32_t components() const { return count_; }

 private:
  std::vector<int32_t> parent_, rank_, size_;
  int32_t count_;
};

}  // namespace

extern "C" {

// Segment a weighted undirected graph.
//  edges_a/edges_b: int32[num_edges] endpoints
//  weights: float[num_edges]
//  labels (out): int32[num_vertices] compacted component ids
// Returns the number of components.
int32_t segment_graph(int32_t num_vertices, int64_t num_edges,
                      const int32_t* edges_a, const int32_t* edges_b,
                      const float* weights, float k, int32_t min_size,
                      int32_t* labels) {
  std::vector<Edge> edges(static_cast<size_t>(num_edges));
  for (int64_t i = 0; i < num_edges; ++i) {
    edges[i] = {weights[i], edges_a[i], edges_b[i]};
  }
  std::sort(edges.begin(), edges.end(),
            [](const Edge& x, const Edge& y) { return x.w < y.w; });

  UnionFind uf(num_vertices);
  std::vector<float> threshold(num_vertices, k);
  for (const Edge& e : edges) {
    int32_t a = uf.find(e.a);
    int32_t b = uf.find(e.b);
    if (a == b) continue;
    if (e.w <= threshold[a] && e.w <= threshold[b]) {
      uf.join(a, b);
      int32_t root = uf.find(a);
      threshold[root] = e.w + k / static_cast<float>(uf.size(root));
    }
  }
  // enforce minimum component size
  if (min_size > 0) {
    for (const Edge& e : edges) {
      int32_t a = uf.find(e.a);
      int32_t b = uf.find(e.b);
      if (a != b && (uf.size(a) < min_size || uf.size(b) < min_size)) {
        uf.join(a, b);
      }
    }
  }
  // compact ids
  std::vector<int32_t> remap(num_vertices, -1);
  int32_t next = 0;
  for (int32_t v = 0; v < num_vertices; ++v) {
    int32_t root = uf.find(v);
    if (remap[root] < 0) remap[root] = next++;
    labels[v] = remap[root];
  }
  return next;
}

}  // extern "C"
