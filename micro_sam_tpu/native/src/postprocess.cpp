// Native postprocessing ops for micro_sam_tpu (nifty/vigra replacement surface).
//
// Exposed via a plain C ABI consumed through ctypes (micro_sam_tpu/native/__init__.py):
//   - label_multilabel_2d: connected components that respect input label
//     boundaries (two touching regions with different ids stay separate)
//   - seeded_watershed_2d / _3d: priority-flood watershed from integer seeds
//     on a float heightmap restricted to a mask
//   - rle_encode_colmajor: COCO-style column-major run-length encoding
//   - greedy_multicut: additive edge contraction for the 3d merging graph
//
// Build: python -m micro_sam_tpu.native.build  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>
#include <unordered_map>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find connected components over (label, 4-adjacency) for 2d arrays.
// Output ids are consecutive starting at 1; 0 stays background.
// ---------------------------------------------------------------------------

static int64_t uf_find(std::vector<int64_t>& parent, int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
        int64_t next = parent[x];
        parent[x] = root;
        x = next;
    }
    return root;
}

int64_t label_multilabel_2d(const uint32_t* seg, uint32_t* out,
                            int64_t h, int64_t w) {
    const int64_t n = h * w;
    std::vector<int64_t> parent(n);
    for (int64_t i = 0; i < n; ++i) parent[i] = i;

    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            const int64_t i = y * w + x;
            const uint32_t v = seg[i];
            if (v == 0) continue;
            if (x + 1 < w && seg[i + 1] == v) {
                int64_t a = uf_find(parent, i), b = uf_find(parent, i + 1);
                if (a != b) parent[std::max(a, b)] = std::min(a, b);
            }
            if (y + 1 < h && seg[i + w] == v) {
                int64_t a = uf_find(parent, i), b = uf_find(parent, i + w);
                if (a != b) parent[std::max(a, b)] = std::min(a, b);
            }
        }
    }

    std::unordered_map<int64_t, uint32_t> remap;
    remap.reserve(1024);
    uint32_t next_id = 1;
    for (int64_t i = 0; i < n; ++i) {
        if (seg[i] == 0) { out[i] = 0; continue; }
        int64_t root = uf_find(parent, i);
        auto it = remap.find(root);
        if (it == remap.end()) {
            remap.emplace(root, next_id);
            out[i] = next_id++;
        } else {
            out[i] = it->second;
        }
    }
    return static_cast<int64_t>(next_id - 1);
}

// ---------------------------------------------------------------------------
// Seeded watershed (priority flood) on a float32 heightmap.
// seeds: uint32 labels (0 = unlabeled), mask: uint8 (0 = excluded).
// In/out: seeds buffer is extended in place (pass a copy from python).
// ---------------------------------------------------------------------------

struct WsEntry {
    float height;
    uint64_t order;
    int64_t idx;
    uint32_t label;
};

struct WsCompare {
    bool operator()(const WsEntry& a, const WsEntry& b) const {
        if (a.height != b.height) return a.height > b.height;   // min-heap
        return a.order > b.order;                                // FIFO tiebreak
    }
};

void seeded_watershed_2d(const float* height, uint32_t* labels,
                         const uint8_t* mask, int64_t h, int64_t w) {
    const int64_t n = h * w;
    std::vector<uint8_t> visited(n, 0);
    std::priority_queue<WsEntry, std::vector<WsEntry>, WsCompare> heap;
    uint64_t order = 0;

    auto push_neighbors = [&](int64_t idx, uint32_t lbl) {
        const int64_t y = idx / w, x = idx % w;
        const int64_t nbs[4] = {
            (y > 0) ? idx - w : -1,
            (y + 1 < h) ? idx + w : -1,
            (x > 0) ? idx - 1 : -1,
            (x + 1 < w) ? idx + 1 : -1,
        };
        for (int k = 0; k < 4; ++k) {
            const int64_t nb = nbs[k];
            if (nb < 0 || visited[nb] || !mask[nb] || labels[nb] != 0) continue;
            heap.push({height[nb], order++, nb, lbl});
        }
    };

    for (int64_t i = 0; i < n; ++i) {
        if (labels[i] != 0) {
            visited[i] = 1;
            push_neighbors(i, labels[i]);
        } else if (!mask[i]) {
            visited[i] = 1;
        }
    }

    while (!heap.empty()) {
        WsEntry e = heap.top();
        heap.pop();
        if (visited[e.idx]) continue;
        visited[e.idx] = 1;
        labels[e.idx] = e.label;
        push_neighbors(e.idx, e.label);
    }
}

void seeded_watershed_3d(const float* height, uint32_t* labels,
                         const uint8_t* mask, int64_t d, int64_t h, int64_t w) {
    const int64_t n = d * h * w;
    const int64_t hw = h * w;
    std::vector<uint8_t> visited(n, 0);
    std::priority_queue<WsEntry, std::vector<WsEntry>, WsCompare> heap;
    uint64_t order = 0;

    auto push_neighbors = [&](int64_t idx, uint32_t lbl) {
        const int64_t z = idx / hw, rem = idx % hw;
        const int64_t y = rem / w, x = rem % w;
        const int64_t nbs[6] = {
            (z > 0) ? idx - hw : -1,
            (z + 1 < d) ? idx + hw : -1,
            (y > 0) ? idx - w : -1,
            (y + 1 < h) ? idx + w : -1,
            (x > 0) ? idx - 1 : -1,
            (x + 1 < w) ? idx + 1 : -1,
        };
        for (int k = 0; k < 6; ++k) {
            const int64_t nb = nbs[k];
            if (nb < 0 || visited[nb] || !mask[nb] || labels[nb] != 0) continue;
            heap.push({height[nb], order++, nb, lbl});
        }
    };

    for (int64_t i = 0; i < n; ++i) {
        if (labels[i] != 0) {
            visited[i] = 1;
            push_neighbors(i, labels[i]);
        } else if (!mask[i]) {
            visited[i] = 1;
        }
    }

    while (!heap.empty()) {
        WsEntry e = heap.top();
        heap.pop();
        if (visited[e.idx]) continue;
        visited[e.idx] = 1;
        labels[e.idx] = e.label;
        push_neighbors(e.idx, e.label);
    }
}

// ---------------------------------------------------------------------------
// Column-major (Fortran) RLE, counts starting with the zero run (COCO layout).
// counts buffer must have room for h*w + 2 entries. Returns #counts.
// ---------------------------------------------------------------------------

int64_t rle_encode_colmajor(const uint8_t* mask, int64_t* counts,
                            int64_t h, int64_t w) {
    int64_t n_counts = 0;
    uint8_t current = 0;  // runs start with zeros
    int64_t run = 0;
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) {
            const uint8_t v = mask[y * w + x] ? 1 : 0;
            if (v == current) {
                ++run;
            } else {
                counts[n_counts++] = run;
                current = v;
                run = 1;
            }
        }
    }
    counts[n_counts++] = run;
    return n_counts;
}

// ---------------------------------------------------------------------------
// Greedy additive edge contraction (multicut decomposition heuristic).
// uv_ids: (n_edges, 2) int64; costs: float64 (positive = attractive).
// node_labels out: int64 (n_nodes), consecutive from 0.
// ---------------------------------------------------------------------------

void greedy_multicut(int64_t n_nodes, const int64_t* uv_ids, const double* costs,
                     int64_t n_edges, int64_t* node_labels) {
    std::vector<int64_t> parent(n_nodes);
    for (int64_t i = 0; i < n_nodes; ++i) parent[i] = i;

    // aggregate duplicate edges
    struct Edge { int64_t u, v; double cost; };
    std::unordered_map<uint64_t, double> edge_costs;
    edge_costs.reserve(n_edges * 2);
    auto key_of = [](int64_t a, int64_t b) {
        if (a > b) std::swap(a, b);
        return (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
    };
    for (int64_t e = 0; e < n_edges; ++e) {
        edge_costs[key_of(uv_ids[2 * e], uv_ids[2 * e + 1])] += costs[e];
    }

    // max-heap of attractive edges
    struct HeapEdge {
        double cost;
        int64_t u, v;
        bool operator<(const HeapEdge& o) const { return cost < o.cost; }
    };
    std::priority_queue<HeapEdge> heap;
    for (auto& kv : edge_costs) {
        if (kv.second > 0) {
            heap.push({kv.second,
                       static_cast<int64_t>(kv.first >> 32),
                       static_cast<int64_t>(kv.first & 0xffffffffULL)});
        }
    }

    // lazy contraction: re-evaluate cluster-to-cluster cost on pop
    while (!heap.empty()) {
        HeapEdge e = heap.top();
        heap.pop();
        int64_t ru = uf_find(parent, e.u), rv = uf_find(parent, e.v);
        if (ru == rv) continue;
        // recompute current cost between the two clusters
        double total = 0;
        for (auto& kv : edge_costs) {
            int64_t a = static_cast<int64_t>(kv.first >> 32);
            int64_t b = static_cast<int64_t>(kv.first & 0xffffffffULL);
            int64_t ra = uf_find(parent, a), rb = uf_find(parent, b);
            if ((ra == ru && rb == rv) || (ra == rv && rb == ru)) total += kv.second;
        }
        if (total <= 0) continue;
        parent[std::max(ru, rv)] = std::min(ru, rv);
    }

    std::unordered_map<int64_t, int64_t> remap;
    int64_t next_id = 0;
    for (int64_t i = 0; i < n_nodes; ++i) {
        int64_t root = uf_find(parent, i);
        auto it = remap.find(root);
        if (it == remap.end()) {
            remap.emplace(root, next_id);
            node_labels[i] = next_id++;
        } else {
            node_labels[i] = it->second;
        }
    }
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------------
// RLE directly from an MSB-first packed bitstream (COCO layout: runs start
// with zeros). Used by the AMG device pipeline: masks are transposed and
// bit-packed on the TPU so the packed bytes are already in Fortran order.
// counts must have room for n_bits + 2 entries. Returns #counts.
// ---------------------------------------------------------------------------

int64_t rle_encode_packed(const uint8_t* bits, int64_t n_bits, int64_t* counts) {
    int64_t n_counts = 0;
    uint8_t current = 0;
    int64_t run = 0;
    const int64_t n_bytes = n_bits / 8;
    for (int64_t i = 0; i < n_bytes; ++i) {
        const uint8_t byte = bits[i];
        if (byte == 0x00 && current == 0) { run += 8; continue; }
        if (byte == 0xFF && current == 1) { run += 8; continue; }
        for (int b = 7; b >= 0; --b) {
            const uint8_t v = (byte >> b) & 1;
            if (v == current) {
                ++run;
            } else {
                counts[n_counts++] = run;
                current = v;
                run = 1;
            }
        }
    }
    for (int64_t i = n_bytes * 8; i < n_bits; ++i) {
        const uint8_t v = (bits[i / 8] >> (7 - (i % 8))) & 1;
        if (v == current) { ++run; } else { counts[n_counts++] = run; current = v; run = 1; }
    }
    counts[n_counts++] = run;
    return n_counts;
}

}  // extern "C"
