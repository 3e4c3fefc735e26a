// Binned SAH BVH builder (host, C++).
//
// TPU-native replacement for the driver-side BLAS build the reference gets
// from D3D12 (/root/reference/libs/DXRFramework/Helpers/BottomLevelASGenerator.cpp):
// static scenes get a maximum-quality surface-area-heuristic tree built once
// on the host; dynamic geometry uses the device-side Morton builder
// (dxrexperiments_tpu/accel/bvh.py). Both emit the same explicit node-array
// format consumed by the traversal kernels:
//
//   nodes_lo/hi [M, 3] f32, child [M, 2] i32:
//     internal: child[m] = {left_node, right_node}
//     leaf:     child[m] = {-(start+1), count}  (range into `order`)
//   order [T] i32: triangle permutation, leaves reference contiguous runs.
//
// 16-bin SAH with leaf cutoff; nodes laid out in DFS order (left child
// immediately follows its parent for cache-friendly traversal).

#include <algorithm>
#include <cfloat>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct AABB {
  float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
  float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const AABB& o) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], o.lo[k]);
      hi[k] = std::max(hi[k], o.hi[k]);
    }
  }
  void grow(const float* p) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], p[k]);
      hi[k] = std::max(hi[k], p[k]);
    }
  }
  float area() const {
    float d[3] = {std::max(hi[0] - lo[0], 0.f), std::max(hi[1] - lo[1], 0.f),
                  std::max(hi[2] - lo[2], 0.f)};
    return 2.f * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]);
  }
};

struct Builder {
  const float* v0;
  const float* e1;
  const float* e2;
  int64_t n;
  int leaf_size;
  std::vector<AABB> tri_box;
  std::vector<float> centroid;  // 3 per tri
  std::vector<int32_t> order;
  std::vector<float> nodes_lo, nodes_hi;
  std::vector<int32_t> child;

  int32_t new_node() {
    nodes_lo.insert(nodes_lo.end(), {0, 0, 0});
    nodes_hi.insert(nodes_hi.end(), {0, 0, 0});
    child.insert(child.end(), {0, 0});
    return static_cast<int32_t>(child.size() / 2 - 1);
  }

  void set_box(int32_t node, const AABB& b) {
    memcpy(&nodes_lo[node * 3], b.lo, 12);
    memcpy(&nodes_hi[node * 3], b.hi, 12);
  }

  int32_t build(int64_t start, int64_t count) {
    AABB box, cbox;
    for (int64_t i = start; i < start + count; ++i) {
      box.grow(tri_box[order[i]]);
      cbox.grow(&centroid[order[i] * 3]);
    }
    int32_t node = new_node();
    set_box(node, box);

    if (count <= leaf_size) {
      child[node * 2] = static_cast<int32_t>(-(start + 1));
      child[node * 2 + 1] = static_cast<int32_t>(count);
      return node;
    }

    // 16-bin SAH over the widest centroid axis.
    constexpr int BINS = 16;
    int axis = 0;
    float extent = 0;
    for (int k = 0; k < 3; ++k) {
      float e = cbox.hi[k] - cbox.lo[k];
      if (e > extent) {
        extent = e;
        axis = k;
      }
    }
    int64_t mid;
    if (extent < 1e-12f) {
      mid = start + count / 2;  // degenerate: median split
    } else {
      AABB bin_box[BINS];
      int64_t bin_cnt[BINS] = {0};
      float scale = BINS / extent;
      auto bin_of = [&](int32_t t) {
        int b = static_cast<int>((centroid[t * 3 + axis] - cbox.lo[axis]) * scale);
        return std::min(std::max(b, 0), BINS - 1);
      };
      for (int64_t i = start; i < start + count; ++i) {
        int b = bin_of(order[i]);
        bin_box[b].grow(tri_box[order[i]]);
        ++bin_cnt[b];
      }
      float right_area[BINS];
      AABB acc;
      for (int b = BINS - 1; b > 0; --b) {
        acc.grow(bin_box[b]);
        right_area[b] = acc.area();
      }
      AABB lacc;
      int64_t lcnt = 0;
      float best_cost = FLT_MAX;
      int best_split = -1;
      for (int b = 0; b < BINS - 1; ++b) {
        lacc.grow(bin_box[b]);
        lcnt += bin_cnt[b];
        if (lcnt == 0 || lcnt == count) continue;
        float cost = lacc.area() * lcnt + right_area[b + 1] * (count - lcnt);
        if (cost < best_cost) {
          best_cost = cost;
          best_split = b;
        }
      }
      float leaf_cost = box.area() * count;
      if (best_split < 0 || (count <= 2 * leaf_size && best_cost >= leaf_cost)) {
        mid = start + count / 2;
        std::nth_element(
            order.begin() + start, order.begin() + mid,
            order.begin() + start + count, [&](int32_t a, int32_t b2) {
              return centroid[a * 3 + axis] < centroid[b2 * 3 + axis];
            });
      } else {
        auto it = std::partition(
            order.begin() + start, order.begin() + start + count,
            [&](int32_t t) { return bin_of(t) <= best_split; });
        mid = it - order.begin();
        if (mid == start || mid == start + count) mid = start + count / 2;
      }
    }

    int32_t left = build(start, mid - start);
    int32_t right = build(mid, start + count - mid);
    child[node * 2] = left;
    child[node * 2 + 1] = right;
    return node;
  }
};

}  // namespace

extern "C" {

// Build; returns opaque handle. v0/e1/e2 are [n,3] row-major float32.
void* sah_build(const float* v0, const float* e1, const float* e2, int64_t n,
                int32_t leaf_size) {
  auto* b = new Builder{v0, e1, e2, n, leaf_size};
  b->tri_box.resize(n);
  b->centroid.resize(n * 3);
  b->order.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* a = v0 + i * 3;
    float p1[3] = {a[0] + e1[i * 3], a[1] + e1[i * 3 + 1], a[2] + e1[i * 3 + 2]};
    float p2[3] = {a[0] + e2[i * 3], a[1] + e2[i * 3 + 1], a[2] + e2[i * 3 + 2]};
    b->tri_box[i].grow(a);
    b->tri_box[i].grow(p1);
    b->tri_box[i].grow(p2);
    for (int k = 0; k < 3; ++k)
      b->centroid[i * 3 + k] = 0.5f * (b->tri_box[i].lo[k] + b->tri_box[i].hi[k]);
    b->order[i] = static_cast<int32_t>(i);
  }
  if (n > 0) b->build(0, n);
  return b;
}

int64_t sah_num_nodes(void* h) {
  return static_cast<Builder*>(h)->child.size() / 2;
}

void sah_copy(void* h, float* nodes_lo, float* nodes_hi, int32_t* child,
              int32_t* order) {
  auto* b = static_cast<Builder*>(h);
  memcpy(nodes_lo, b->nodes_lo.data(), b->nodes_lo.size() * sizeof(float));
  memcpy(nodes_hi, b->nodes_hi.data(), b->nodes_hi.size() * sizeof(float));
  memcpy(child, b->child.data(), b->child.size() * sizeof(int32_t));
  memcpy(order, b->order.data(), b->order.size() * sizeof(int32_t));
}

void sah_free(void* h) { delete static_cast<Builder*>(h); }

}  // extern "C"
