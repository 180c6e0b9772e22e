// Iso-surface extraction via marching tetrahedra (6-tet cube decomposition).
//
// Native counterpart of the reference's skimage.measure.marching_cubes call
// (reference: src/mesh_nerf.py:79). Table-free: each cube is split into six
// tetrahedra sharing the main diagonal; each tet contributes 0/1/2
// triangles with vertices linearly interpolated on its edges. Vertices are
// deduplicated per grid edge, so the mesh is watertight across cells.
// Vertex normals are the (negated, normalized) central-difference density
// gradient interpolated at the vertex — matching skimage's convention of
// normals pointing toward lower density.
//
// Exposed C ABI (ctypes):
//   int64 mt_extract(const float* grid, int nx, int ny, int nz, float iso,
//                    float** verts, int64* nverts,
//                    int32** tris,  int64* ntris,
//                    float** normals);
//   void  mt_free(void* p);
//
// Grid layout: grid[(x*ny + y)*nz + z] (C-order, axis order x,y,z like
// numpy .reshape(nx,ny,nz)); vertex coordinates are in grid-index space.

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
    float x, y, z;
};

// The six tetrahedra of a cube, as corner indices 0..7 where corner bit
// order is (x<<2 | y<<1 | z). All six share the main diagonal 0-7.
static const int TETS[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

static const int CORNER_OFF[8][3] = {
    {0, 0, 0}, {0, 0, 1}, {0, 1, 0}, {0, 1, 1},
    {1, 0, 0}, {1, 0, 1}, {1, 1, 0}, {1, 1, 1},
};

struct Extractor {
    const float* grid;
    int64_t nx, ny, nz;
    float iso;

    // Sparse-block mode (mt_extract_sparse): when `lookup` is set, values
    // come from fetched 8^3 blocks (`packed`, indexed via lookup) with
    // per-block fills elsewhere; `grid` is unused.
    const int32_t* lookup = nullptr;
    const float* fill = nullptr;
    const float* packed = nullptr;
    int64_t B = 0;

    std::vector<float> verts;    // 3 floats per vertex
    std::vector<int32_t> tris;   // 3 indices per triangle
    std::unordered_map<uint64_t, int32_t> edge_cache;

    inline float at(int64_t x, int64_t y, int64_t z) const {
        if (lookup) {
            int64_t b = ((x >> 3) * B + (y >> 3)) * B + (z >> 3);
            int32_t k = lookup[b];
            if (k < 0) return fill[b];
            return packed[(int64_t)k * 512 + (((x & 7) * 8 + (y & 7)) * 8) + (z & 7)];
        }
        return grid[(x * ny + y) * nz + z];
    }

    inline int64_t lin(int64_t x, int64_t y, int64_t z) const {
        return (x * ny + y) * nz + z;
    }

    // Density gradient by central differences (one-sided at borders).
    inline V3 gradient(int64_t x, int64_t y, int64_t z) const {
        auto d1 = [](float lo, float hi, float h) { return (hi - lo) / h; };
        V3 g;
        g.x = d1(at(x > 0 ? x - 1 : x, y, z), at(x < nx - 1 ? x + 1 : x, y, z),
                 (x > 0 && x < nx - 1) ? 2.f : 1.f);
        g.y = d1(at(x, y > 0 ? y - 1 : y, z), at(x, y < ny - 1 ? y + 1 : y, z),
                 (y > 0 && y < ny - 1) ? 2.f : 1.f);
        g.z = d1(at(x, y, z > 0 ? z - 1 : z), at(x, y, z < nz - 1 ? z + 1 : z),
                 (z > 0 && z < nz - 1) ? 2.f : 1.f);
        return g;
    }

    // Unique vertex on the grid edge (a, b); returns its index.
    int32_t edge_vertex(int64_t ax, int64_t ay, int64_t az, float va,
                        int64_t bx, int64_t by, int64_t bz, float vb) {
        int64_t la = lin(ax, ay, az), lb = lin(bx, by, bz);
        if (la > lb) {
            std::swap(la, lb);
            std::swap(ax, bx);
            std::swap(ay, by);
            std::swap(az, bz);
            std::swap(va, vb);
        }
        uint64_t key = (uint64_t)la * (uint64_t)(nx * ny * nz) + (uint64_t)lb;
        auto it = edge_cache.find(key);
        if (it != edge_cache.end()) return it->second;

        float denom = vb - va;
        float t = std::fabs(denom) < 1e-12f ? 0.5f : (iso - va) / denom;
        if (t < 0.f) t = 0.f;
        if (t > 1.f) t = 1.f;
        int32_t idx = (int32_t)(verts.size() / 3);
        verts.push_back((float)ax + t * (float)(bx - ax));
        verts.push_back((float)ay + t * (float)(by - ay));
        verts.push_back((float)az + t * (float)(bz - az));
        edge_cache.emplace(key, idx);
        return idx;
    }

    void emit(int32_t a, int32_t b, int32_t c) {
        if (a == b || b == c || a == c) return;  // degenerate
        tris.push_back(a);
        tris.push_back(b);
        tris.push_back(c);
    }

    void handle_tet(const int64_t cx[8][3], const float cv[8], const int t[4]) {
        int inside = 0;
        bool in[4];
        for (int i = 0; i < 4; ++i) {
            in[i] = cv[t[i]] > iso;
            inside += in[i];
        }
        if (inside == 0 || inside == 4) return;

        auto ev = [&](int i, int j) {
            int a = t[i], b = t[j];
            return edge_vertex(cx[a][0], cx[a][1], cx[a][2], cv[a],
                               cx[b][0], cx[b][1], cx[b][2], cv[b]);
        };

        // Find the lone corner (inside==1/3) or the in-pair (inside==2).
        if (inside == 1 || inside == 3) {
            bool flag = (inside == 1);
            int lone = 0;
            for (int i = 0; i < 4; ++i)
                if (in[i] == flag) lone = i;
            int o[3], n = 0;
            for (int i = 0; i < 4; ++i)
                if (i != lone) o[n++] = i;
            int32_t v0 = ev(lone, o[0]);
            int32_t v1 = ev(lone, o[1]);
            int32_t v2 = ev(lone, o[2]);
            emit(v0, v1, v2);
        } else {  // 2 in / 2 out: quad split into two triangles
            int a[2], b[2], na = 0, nb = 0;
            for (int i = 0; i < 4; ++i)
                (in[i] ? a[na++] : b[nb++]) = i;
            int32_t v00 = ev(a[0], b[0]);
            int32_t v01 = ev(a[0], b[1]);
            int32_t v10 = ev(a[1], b[0]);
            int32_t v11 = ev(a[1], b[1]);
            emit(v00, v10, v01);
            emit(v01, v10, v11);
        }
    }

    // Process one surface-crossing cell (x, y, z).
    inline void cell(int64_t x, int64_t y, int64_t z) {
        int64_t corners_x[8][3];
        float cv[8];
        for (int c = 0; c < 8; ++c) {
            int64_t px = x + CORNER_OFF[c][0];
            int64_t py = y + CORNER_OFF[c][1];
            int64_t pz = z + CORNER_OFF[c][2];
            corners_x[c][0] = px;
            corners_x[c][1] = py;
            corners_x[c][2] = pz;
            cv[c] = at(px, py, pz);
        }
        for (int t = 0; t < 6; ++t)
            handle_tet(corners_x, cv, TETS[t]);
    }

    void run() {
        // Bitmask prescreen: the surface typically crosses ~1% of cells, so
        // the naive scan's 8 corner loads per cell dominate extraction. Per
        // grid row (x, y) build an nz-bit mask of (v > iso); a cell is
        // active iff its 4 corner rows contain both an inside and an
        // outside bit at z/z+1 — evaluated 64 cells at a time with word
        // ops, skipping empty words entirely.
        const int64_t words = (nz + 63) >> 6;
        std::vector<uint64_t> slabs(2 * ny * words);
        auto build_slab = [&](int64_t x, uint64_t* dst) {
            for (int64_t y = 0; y < ny; ++y) {
                const float* row = grid + (x * ny + y) * nz;
                uint64_t* m = dst + y * words;
                std::memset(m, 0, sizeof(uint64_t) * words);
                for (int64_t z = 0; z < nz; ++z)
                    if (row[z] > iso) m[z >> 6] |= 1ull << (z & 63);
            }
        };
        // Valid value bits in the last word (z < nz).
        const uint64_t tail_valid =
            (nz & 63) ? ((1ull << (nz & 63)) - 1) : ~0ull;

        build_slab(0, slabs.data());
        for (int64_t x = 0; x + 1 < nx; ++x) {
            uint64_t* s0 = slabs.data() + (x & 1) * ny * words;
            uint64_t* s1 = slabs.data() + ((x + 1) & 1) * ny * words;
            build_slab(x + 1, s1);
            for (int64_t y = 0; y + 1 < ny; ++y) {
                const uint64_t* rows[4] = {
                    s0 + y * words, s0 + (y + 1) * words,
                    s1 + y * words, s1 + (y + 1) * words,
                };
                for (int64_t w = 0; w < words; ++w) {
                    const uint64_t valid = (w == words - 1) ? tail_valid : ~0ull;
                    uint64_t in = 0, out = 0;
                    for (int r = 0; r < 4; ++r) {
                        uint64_t m = rows[r][w];
                        uint64_t nb =
                            (w + 1 < words) ? (rows[r][w + 1] & 1ull) : 0ull;
                        in |= m | (m >> 1) | (nb << 63);
                        uint64_t mo = ~m & valid;
                        uint64_t nbo =
                            (w + 1 < words) ? (~rows[r][w + 1] & 1ull) : 0ull;
                        out |= mo | (mo >> 1) | (nbo << 63);
                    }
                    // Cells exist for z in [0, nz-2]: drop the bit for
                    // z == nz-1 (and padding) in the last word.
                    uint64_t cells_valid = valid;
                    if ((w + 1) * 64 >= nz - 1) {
                        int64_t ncell = (nz - 1) - w * 64;
                        cells_valid =
                            (ncell <= 0)
                                ? 0ull
                                : (ncell >= 64 ? ~0ull
                                               : ((1ull << ncell) - 1));
                    }
                    uint64_t act = in & out & cells_valid;
                    while (act) {
                        int64_t z = w * 64 + __builtin_ctzll(act);
                        act &= act - 1;
                        cell(x, y, z);
                    }
                }
            }
        }
    }

    // Sparse-block traversal: only cells whose min corner lies in a
    // fetched block are visited. Crossing cells always land entirely in
    // fetched blocks (every cell is inside the dilated stats window of
    // each block it touches, see mesh/extract.py:_sparse_density_extract),
    // so this is exhaustive. ~K*512 cells instead of res^3.
    void run_sparse(const int32_t* ids, int64_t K) {
        for (int64_t n = 0; n < K; ++n) {
            int64_t id = ids[n];
            int64_t bx = (id / (B * B)) * 8, by = ((id / B) % B) * 8,
                    bz = (id % B) * 8;
            int64_t xe = bx + 8 < nx ? bx + 8 : nx - 1;
            int64_t ye = by + 8 < ny ? by + 8 : ny - 1;
            int64_t ze = bz + 8 < nz ? bz + 8 : nz - 1;
            const float* blk = packed + n * 512;
            for (int64_t x = bx; x < xe; ++x)
                for (int64_t y = by; y < ye; ++y) {
                    // Interior fast path: for cells fully inside the block
                    // prescreen the 8 corners from `blk` directly.
                    for (int64_t z = bz; z < ze; ++z) {
                        if (x + 1 < xe && y + 1 < ye && z + 1 < ze) {
                            int64_t o = ((x - bx) * 8 + (y - by)) * 8 + (z - bz);
                            bool s0 = blk[o] > iso;
                            if (blk[o + 1] > iso == s0 && blk[o + 8] > iso == s0 &&
                                blk[o + 9] > iso == s0 && blk[o + 64] > iso == s0 &&
                                blk[o + 65] > iso == s0 && blk[o + 72] > iso == s0 &&
                                blk[o + 73] > iso == s0)
                                continue;
                        }
                        cell(x, y, z);
                    }
                }
        }
    }

    // Per-vertex normals: -grad(density), trilinearly interpolated.
    std::vector<float> normals() const {
        std::vector<float> out(verts.size());
        int64_t n = (int64_t)(verts.size() / 3);
        for (int64_t i = 0; i < n; ++i) {
            float fx = verts[3 * i], fy = verts[3 * i + 1], fz = verts[3 * i + 2];
            int64_t x0 = (int64_t)fx, y0 = (int64_t)fy, z0 = (int64_t)fz;
            if (x0 >= nx - 1) x0 = nx - 2;
            if (y0 >= ny - 1) y0 = ny - 2;
            if (z0 >= nz - 1) z0 = nz - 2;
            float tx = fx - x0, ty = fy - y0, tz = fz - z0;
            V3 acc = {0, 0, 0};
            for (int c = 0; c < 8; ++c) {
                int dx = CORNER_OFF[c][0], dy = CORNER_OFF[c][1], dz = CORNER_OFF[c][2];
                float w = (dx ? tx : 1 - tx) * (dy ? ty : 1 - ty) * (dz ? tz : 1 - tz);
                if (w <= 0.f) continue;
                V3 g = gradient(x0 + dx, y0 + dy, z0 + dz);
                acc.x += w * g.x;
                acc.y += w * g.y;
                acc.z += w * g.z;
            }
            float len = std::sqrt(acc.x * acc.x + acc.y * acc.y + acc.z * acc.z);
            if (len < 1e-12f) len = 1.f;
            out[3 * i] = -acc.x / len;
            out[3 * i + 1] = -acc.y / len;
            out[3 * i + 2] = -acc.z / len;
        }
        return out;
    }
};

}  // namespace

extern "C" {

int64_t mt_extract(const float* grid, int64_t nx, int64_t ny, int64_t nz,
                   float iso, float** out_verts, int64_t* out_nverts,
                   int32_t** out_tris, int64_t* out_ntris,
                   float** out_normals) {
    if (nx < 2 || ny < 2 || nz < 2) return -1;
    Extractor ex;
    ex.grid = grid;
    ex.nx = nx;
    ex.ny = ny;
    ex.nz = nz;
    ex.iso = iso;
    ex.run();

    int64_t nv = (int64_t)(ex.verts.size() / 3);
    int64_t nt = (int64_t)(ex.tris.size() / 3);
    *out_nverts = nv;
    *out_ntris = nt;
    *out_verts = (float*)std::malloc(sizeof(float) * ex.verts.size());
    *out_tris = (int32_t*)std::malloc(sizeof(int32_t) * ex.tris.size());
    std::memcpy(*out_verts, ex.verts.data(), sizeof(float) * ex.verts.size());
    std::memcpy(*out_tris, ex.tris.data(), sizeof(int32_t) * ex.tris.size());
    if (out_normals) {
        auto nrm = ex.normals();
        *out_normals = (float*)std::malloc(sizeof(float) * nrm.size());
        std::memcpy(*out_normals, nrm.data(), sizeof(float) * nrm.size());
    }
    return 0;
}

void mt_free(void* p) { std::free(p); }

// Sparse-block iso-surface extraction: same outputs as mt_extract, but the
// grid never exists densely — values come from K fetched 8^3 blocks
// (`packed`, flat ids `ids`) over a per-block `fill` background (B^3,
// B = res/8). Exact for every surface-crossing cell by the fetch-set
// construction in mesh/extract.py:_sparse_density_extract.
int64_t mt_extract_sparse(int64_t res, int64_t B, const float* fill,
                          const int32_t* ids, int64_t K, const float* packed,
                          float iso, float** out_verts, int64_t* out_nverts,
                          int32_t** out_tris, int64_t* out_ntris,
                          float** out_normals) {
    if (res < 2 || B * 8 != res) return -1;
    std::vector<int32_t> lookup((size_t)B * B * B, -1);
    for (int64_t n = 0; n < K; ++n) lookup[ids[n]] = (int32_t)n;

    Extractor ex;
    ex.grid = nullptr;
    ex.nx = ex.ny = ex.nz = res;
    ex.iso = iso;
    ex.lookup = lookup.data();
    ex.fill = fill;
    ex.packed = packed;
    ex.B = B;
    ex.run_sparse(ids, K);

    int64_t nv = (int64_t)(ex.verts.size() / 3);
    int64_t nt = (int64_t)(ex.tris.size() / 3);
    *out_nverts = nv;
    *out_ntris = nt;
    *out_verts = (float*)std::malloc(sizeof(float) * (ex.verts.size() + 1));
    *out_tris = (int32_t*)std::malloc(sizeof(int32_t) * (ex.tris.size() + 1));
    std::memcpy(*out_verts, ex.verts.data(), sizeof(float) * ex.verts.size());
    std::memcpy(*out_tris, ex.tris.data(), sizeof(int32_t) * ex.tris.size());
    if (out_normals) {
        auto nrm = ex.normals();
        *out_normals = (float*)std::malloc(sizeof(float) * (nrm.size() + 1));
        std::memcpy(*out_normals, nrm.data(), sizeof(float) * nrm.size());
    }
    return 0;
}

// Reconstruct a dense res^3 grid from the sparse block transfer of
// mesh/extract.py:_sparse_density_extract: every 8^3 block is filled with
// its own fill value (one-sided by construction), then the K fetched
// blocks are scattered in. Pure memory-bandwidth work that numpy's
// interleaved-view broadcasting does ~50x slower.
//   dense: res^3 f32 out (C-order x,y,z)
//   fill:  B^3 f32 per-block fill values, B = res/8
//   ids:   K int32 flat block ids (bx*B*B + by*B + bz)
//   packed: K*512 f32 block values (8x8x8 C-order)
void mt_fill_blocks(float* dense, int64_t res, int64_t B, const float* fill,
                    const int32_t* ids, int64_t K, const float* packed) {
    // Sequential row-major fill: each (x, y) row of `dense` is res
    // contiguous floats whose fill value changes every 8 entries.
    for (int64_t bx = 0; bx < B; bx++)
        for (int64_t i = 0; i < 8; i++)
            for (int64_t by = 0; by < B; by++) {
                const float* frow = fill + (bx * B + by) * B;
                for (int64_t j = 0; j < 8; j++) {
                    float* row = dense + (((bx * 8 + i) * res) + by * 8 + j) * res;
                    for (int64_t bz = 0; bz < B; bz++) {
                        float v = frow[bz];
                        float* p = row + bz * 8;
                        for (int k = 0; k < 8; k++) p[k] = v;
                    }
                }
            }
    for (int64_t n = 0; n < K; n++) {
        int64_t id = ids[n];
        int64_t bx = id / (B * B), by = (id / B) % B, bz = id % B;
        const float* src = packed + n * 512;
        for (int64_t i = 0; i < 8; i++)
            for (int64_t j = 0; j < 8; j++)
                std::memcpy(
                    dense + (((bx * 8 + i) * res) + by * 8 + j) * res + bz * 8,
                    src + (i * 8 + j) * 8, 8 * sizeof(float));
    }
}

// Fast ASCII OBJ writer (same `v x y z [r g b]` / `vn` / `f i//i` layout
// as mesh/export.py:export_obj and the reference's
// src/nerf/nerf_helpers.py:86-111). The python per-row format loop runs
// ~150k lines/s on this host — a 41s tail for a 2.1M-vert flagship mesh.
// std::to_chars emits the SHORTEST round-trip decimal for each float32
// (the same value-preserving text python's repr produces) and is ~10x
// faster than printf %g conversion; everything lands in one app-side
// buffer flushed with fwrite. `diffuse` may be null (then no colors),
// `normals`/`faces` counts may be zero. Returns 0 on success, -1 if the
// file cannot be opened.
namespace {
struct ObjBuf {
    FILE* f;
    std::vector<char> buf;
    size_t pos = 0;
    bool ok = true;  // any short fwrite (disk full, quota) latches false
    explicit ObjBuf(FILE* file) : f(file), buf(1 << 22) {}
    inline void flush() {
        if (pos) {
            if (std::fwrite(buf.data(), 1, pos, f) != pos) ok = false;
            pos = 0;
        }
    }
    inline char* reserve(size_t n) {
        if (pos + n > buf.size()) flush();
        return buf.data() + pos;
    }
    inline void advance(char* end) { pos = end - buf.data(); }
};
inline char* put_f32(char* p, float v) {
    auto r = std::to_chars(p, p + 48, v);
    return r.ptr;
}
inline char* put_i32(char* p, int32_t v) {
    auto r = std::to_chars(p, p + 16, v);
    return r.ptr;
}
}  // namespace

int64_t obj_write(const char* path, const float* verts, int64_t nv,
                  const float* diffuse, const float* normals, int64_t nn,
                  const int32_t* faces, int64_t nf) {
    FILE* f = std::fopen(path, "w");
    if (!f) return -1;
    ObjBuf out(f);
    for (int64_t i = 0; i < nv; i++) {
        const float* v = verts + i * 3;
        char* p = out.reserve(320);
        *p++ = 'v';
        for (int k = 0; k < 3; k++) { *p++ = ' '; p = put_f32(p, v[k]); }
        if (diffuse) {
            const float* c = diffuse + i * 3;
            for (int k = 0; k < 3; k++) { *p++ = ' '; p = put_f32(p, c[k]); }
        }
        *p++ = '\n';
        out.advance(p);
    }
    for (int64_t i = 0; i < nn; i++) {
        const float* n = normals + i * 3;
        char* p = out.reserve(192);
        *p++ = 'v'; *p++ = 'n';
        for (int k = 0; k < 3; k++) { *p++ = ' '; p = put_f32(p, n[k]); }
        *p++ = '\n';
        out.advance(p);
    }
    for (int64_t i = 0; i < nf; i++) {
        const int32_t* t = faces + i * 3;
        char* p = out.reserve(96);
        *p++ = 'f';
        for (int k = 0; k < 3; k++) {
            *p++ = ' ';
            p = put_i32(p, t[k] + 1);
            *p++ = '/'; *p++ = '/';
            p = put_i32(p, t[k] + 1);
        }
        *p++ = '\n';
        out.advance(p);
    }
    out.flush();
    // A truncated OBJ must not report success: the python caller treats a
    // nonzero rc as "fall back to the python writer" (which raises OSError
    // on the same full disk instead of silently shipping a partial mesh).
    bool ok = out.ok && !std::ferror(f);
    if (std::fclose(f) != 0) ok = false;
    return ok ? 0 : -2;
}

}  // extern "C"
