// hostcore — native host-side preprocessing for meshfem_tpu.
//
// The TPU compute path is JAX/XLA; this C++ module is the native runtime
// around it (the role the reference's C++ mesh/connectivity layer plays):
// connectivity construction, FEM edge-node numbering, and scatter-plan
// building over multi-million-element meshes, exposed through a plain C ABI
// loaded with ctypes.  Everything is O(R log R) sort-based and allocation-
// light; Python keeps vectorized numpy fallbacks.
//
// Build: g++ -O3 -march=native -shared -fPIC hostcore.cpp -o libhostcore.so

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Face matching (TriMesh/TetMesh mate construction).
// face_verts: [H, k] vertex ids per half-entity.  Writes opp[H] with the
// paired half-entity index or -1 for boundary.  Returns 0 on success,
// 1 if a face is shared by more than two elements (non-manifold).
// ---------------------------------------------------------------------------
int match_faces(const int64_t* face_verts, int64_t H, int32_t k,
                int64_t* opp) {
    std::vector<std::array<int64_t, 4>> keys(H);
    for (int64_t h = 0; h < H; ++h) {
        std::array<int64_t, 4> key{{0, 0, 0, 0}};
        for (int32_t j = 0; j < k; ++j) key[j] = face_verts[h * k + j];
        std::sort(key.begin(), key.begin() + k);
        key[3] = h;  // carry the index in the last slot (k <= 3)
        keys[h] = key;
    }
    std::sort(keys.begin(), keys.end(),
              [](const std::array<int64_t, 4>& a,
                 const std::array<int64_t, 4>& b) {
                  if (a[0] != b[0]) return a[0] < b[0];
                  if (a[1] != b[1]) return a[1] < b[1];
                  return a[2] < b[2];
              });
    for (int64_t h = 0; h < H; ++h) opp[h] = -1;
    auto same = [&](int64_t i, int64_t j) {
        return keys[i][0] == keys[j][0] && keys[i][1] == keys[j][1] &&
               keys[i][2] == keys[j][2];
    };
    for (int64_t i = 0; i + 1 < H;) {
        if (same(i, i + 1)) {
            if (i + 2 < H && same(i, i + 2)) return 1;  // non-manifold
            opp[keys[i][3]] = keys[i + 1][3];
            opp[keys[i + 1][3]] = keys[i][3];
            i += 2;
        } else {
            ++i;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Unique-edge numbering (P2 node construction, FEMMesh.inl's std::map
// replacement).  pairs: [M, 2] vertex ids.  Writes edge_id[M] (0-based ids
// of the unique sorted-pair set) and unique_pairs[2 * n_unique] (sorted
// lexicographically).  Returns n_unique.
// ---------------------------------------------------------------------------
int64_t unique_edges(const int64_t* pairs, int64_t M, int64_t* edge_id,
                     int64_t* unique_pairs /* capacity 2*M */) {
    std::vector<std::array<int64_t, 3>> keys(M);
    for (int64_t m = 0; m < M; ++m) {
        int64_t a = pairs[2 * m], b = pairs[2 * m + 1];
        if (a > b) std::swap(a, b);
        keys[m] = {{a, b, m}};
    }
    std::sort(keys.begin(), keys.end());
    int64_t nu = -1;
    int64_t pa = -1, pb = -1;
    for (int64_t i = 0; i < M; ++i) {
        if (keys[i][0] != pa || keys[i][1] != pb) {
            ++nu;
            pa = keys[i][0];
            pb = keys[i][1];
            unique_pairs[2 * nu] = pa;
            unique_pairs[2 * nu + 1] = pb;
        }
        edge_id[keys[i][2]] = nu;
    }
    return nu + 1;
}

// ---------------------------------------------------------------------------
// Gather-pyramid scatter-plan construction (sparse/scatter.py ScatterPlan).
// ids: [R] segment ids in [0, N).  Outputs:
//   gidx1 [P1]   (P1 = sum over segments of ceil(count/g1)*g1; dummy = R)
//   gidx2 [N*g2] (g2 = max groups per segment; dummy = NG)
// Two-call protocol: first call with gidx1 == nullptr fills sizes[3] =
// {P1, g2, NG}; second call fills the arrays.
// ---------------------------------------------------------------------------
void build_scatter_plan(const int64_t* ids, int64_t R, int64_t N,
                        int64_t g1, int64_t* sizes, int32_t* gidx1,
                        int32_t* gidx2) {
    std::vector<int64_t> counts(N, 0);
    for (int64_t r = 0; r < R; ++r) counts[ids[r]]++;
    std::vector<int64_t> padded(N), ngroups(N);
    int64_t P1 = 0, NG = 0, g2 = 1;
    for (int64_t v = 0; v < N; ++v) {
        padded[v] = (counts[v] + g1 - 1) / g1 * g1;
        ngroups[v] = padded[v] / g1;
        P1 += padded[v];
        NG += ngroups[v];
        if (ngroups[v] > g2) g2 = ngroups[v];
    }
    sizes[0] = P1;
    sizes[1] = g2;
    sizes[2] = NG;
    if (gidx1 == nullptr) return;

    std::vector<int64_t> offs_p(N + 1, 0), goffs(N + 1, 0);
    for (int64_t v = 0; v < N; ++v) {
        offs_p[v + 1] = offs_p[v] + padded[v];
        goffs[v + 1] = goffs[v] + ngroups[v];
    }
    for (int64_t i = 0; i < P1; ++i) gidx1[i] = (int32_t)R;  // dummy row
    std::vector<int64_t> cursor(offs_p.begin(), offs_p.end() - 1);
    for (int64_t r = 0; r < R; ++r) {
        gidx1[cursor[ids[r]]++] = (int32_t)r;
    }
    for (int64_t i = 0; i < N * g2; ++i) gidx2[i] = (int32_t)NG;  // dummy
    for (int64_t v = 0; v < N; ++v)
        for (int64_t g = 0; g < ngroups[v]; ++g)
            gidx2[v * g2 + g] = (int32_t)(goffs[v] + g);
}

// ---------------------------------------------------------------------------
// Morton codes (mesh/reorder.py) for [n, d] quantized coordinates.
// ---------------------------------------------------------------------------
void morton_codes(const uint64_t* q, int64_t n, int32_t d, int32_t bits,
                  uint64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        uint64_t code = 0;
        for (int32_t b = 0; b < bits; ++b)
            for (int32_t ax = 0; ax < d; ++ax)
                code |= (((q[i * d + ax] >> b) & 1ull) << (b * d + ax));
        out[i] = code;
    }
}

}  // extern "C"
