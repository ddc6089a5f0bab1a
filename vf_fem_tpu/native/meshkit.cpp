// Native mesh-topology kernels.
//
// The reference delegates mesh topology (facet lists, adjacency, entity
// iteration) to dolfin's C++ core (reference: meshutils.py drives
// dfn.Mesh/MeshFunction).  This is the TPU-framework's native equivalent for
// the host-side preprocessing path: hash-based facet extraction and
// adjacency, plus the nearest-neighbour edge-chain sort used to build 1D
// fluid interface meshes (reference: src/femvf/meshutils.py:295-334).
//
// Exposed through ctypes (see vf_fem_tpu/native/__init__.py) with a pure
// numpy fallback, so the Python package works even without a compiler.

#include <cstdint>
#include <cmath>
#include <unordered_map>
#include <vector>
#include <array>
#include <algorithm>

extern "C" {

// Extract unique facets of a simplex mesh and their cell adjacency.
//
// cells: (n_cells * nv) int32, nv = dim+1
// out_facets: preallocated (n_cells * nv * dim) int32 — unique facets
//   written to the front, each as `dim` sorted vertex ids
// out_facet_cell / out_facet_local: (n_cells * nv) int32 — one incident
//   cell per facet and the local facet index (== opposite local vertex)
// out_counts: (n_cells * nv) int32 — number of incident cells (1 = boundary)
// returns: number of unique facets
int64_t build_facets(const int32_t* cells, int64_t n_cells, int32_t dim,
                     int32_t* out_facets, int32_t* out_facet_cell,
                     int32_t* out_facet_local, int32_t* out_counts) {
    const int nv = dim + 1;

    struct KeyHash {
        size_t operator()(const std::array<int32_t, 3>& k) const {
            size_t h = 1469598103934665603ull;
            for (int i = 0; i < 3; ++i) {
                h ^= static_cast<size_t>(k[i]) + 0x9e3779b97f4a7c15ull +
                     (h << 6) + (h >> 2);
            }
            return h;
        }
    };

    std::unordered_map<std::array<int32_t, 3>, int64_t, KeyHash> lookup;
    lookup.reserve(static_cast<size_t>(n_cells) * nv);

    int64_t n_facets = 0;
    std::array<int32_t, 3> key{};
    for (int64_t c = 0; c < n_cells; ++c) {
        const int32_t* cv = cells + c * nv;
        for (int lf = 0; lf < nv; ++lf) {
            // facet lf = all vertices except local vertex lf
            int k = 0;
            for (int j = 0; j < nv; ++j) {
                if (j != lf) key[k++] = cv[j];
            }
            for (; k < 3; ++k) key[k] = -1;
            std::sort(key.begin(), key.begin() + dim);

            auto it = lookup.find(key);
            if (it == lookup.end()) {
                int64_t idx = n_facets++;
                lookup.emplace(key, idx);
                for (int j = 0; j < dim; ++j) out_facets[idx * dim + j] = key[j];
                out_facet_cell[idx] = static_cast<int32_t>(c);
                out_facet_local[idx] = lf;
                out_counts[idx] = 1;
            } else {
                int64_t idx = it->second;
                out_counts[idx] += 1;
                // keep the first incident cell (same convention as numpy path
                // is irrelevant: only boundary facets' adjacency is used, and
                // those have exactly one incident cell)
            }
        }
    }
    return n_facets;
}

// Nearest-neighbour chain sort of points starting nearest the origin.
// coords: (n * gdim) float64; out_perm: (n,) int32
void sort_edge_chain(const double* coords, int64_t n, int32_t gdim,
                     const double* origin, int32_t* out_perm) {
    std::vector<char> used(n, 0);

    auto dist2 = [&](int64_t i, const double* p) {
        double s = 0.0;
        for (int d = 0; d < gdim; ++d) {
            double diff = coords[i * gdim + d] - p[d];
            s += diff * diff;
        }
        return s;
    };

    // start nearest the origin
    int64_t cur = 0;
    double best = dist2(0, origin);
    for (int64_t i = 1; i < n; ++i) {
        double d = dist2(i, origin);
        if (d < best) { best = d; cur = i; }
    }
    out_perm[0] = static_cast<int32_t>(cur);
    used[cur] = 1;

    for (int64_t k = 1; k < n; ++k) {
        const double* p = coords + cur * gdim;
        int64_t nxt = -1;
        double bd = 0.0;
        for (int64_t i = 0; i < n; ++i) {
            if (used[i]) continue;
            double d = dist2(i, p);
            if (nxt < 0 || d < bd) { bd = d; nxt = i; }
        }
        out_perm[k] = static_cast<int32_t>(nxt);
        used[nxt] = 1;
        cur = nxt;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Planar triangulation kernels (used by mesh/triangulate.py): the distmesh
// smoothing loop evaluates point-in-polygon and distance-to-boundary for
// every candidate point each iteration, O(n_points * n_boundary) — the
// mesh-generation hot spot for refined M5 meshes.
// ---------------------------------------------------------------------------

extern "C" void points_in_polygon(
    const double* pts, int64_t n_pts,
    const double* poly, int64_t n_poly,
    uint8_t* out)
{
    for (int64_t p = 0; p < n_pts; ++p) {
        const double px = pts[2 * p], py = pts[2 * p + 1];
        int wn = 0;
        for (int64_t e = 0; e < n_poly; ++e) {
            const int64_t f = (e + 1) % n_poly;
            const double x0 = poly[2 * e], y0 = poly[2 * e + 1];
            const double x1 = poly[2 * f], y1 = poly[2 * f + 1];
            if (y0 <= py) {
                if (y1 > py &&
                    (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0) > 0)
                    ++wn;
            } else {
                if (y1 <= py &&
                    (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0) < 0)
                    --wn;
            }
        }
        out[p] = (wn != 0) ? 1 : 0;
    }
}

extern "C" void dist_to_polyline(
    const double* pts, int64_t n_pts,
    const double* poly, int64_t n_poly,
    double* out)
{
    for (int64_t p = 0; p < n_pts; ++p) {
        const double px = pts[2 * p], py = pts[2 * p + 1];
        double best = 1e300;
        for (int64_t e = 0; e < n_poly; ++e) {
            const int64_t f = (e + 1) % n_poly;
            const double ax = poly[2 * e], ay = poly[2 * e + 1];
            const double bx = poly[2 * f] - ax, by = poly[2 * f + 1] - ay;
            const double bb = bx * bx + by * by;
            double t = bb > 1e-30 ? ((px - ax) * bx + (py - ay) * by) / bb
                                  : 0.0;
            t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
            const double dx = px - (ax + t * bx), dy = py - (ay + t * by);
            const double d2 = dx * dx + dy * dy;
            if (d2 < best) best = d2;
        }
        out[p] = __builtin_sqrt(best);
    }
}
