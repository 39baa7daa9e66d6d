// Native host-side runtime components: CAPT tree construction and pointcloud
// filtering. These sit OFF the TPU compute path (which is JAX/XLA) but on the
// environment-construction path, where the reference also uses native code
// (collision/capt.hh builds in C++; collision/filter.hh filters with SIMD
// Morton sorts). C ABI for ctypes binding; no external dependencies.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 capt_native.cc -o libcapt_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_set>
#include <vector>

namespace
{
    constexpr float FAR = 1.0e9F;

    struct Builder
    {
        const float *pts;  // (n_pad, 3), +inf padded
        uint32_t n_pad;
        float max_aff_l1;
        std::vector<float> tests;
        std::vector<std::vector<uint32_t>> leaf_lists;  // per-leaf point ids
        std::vector<uint32_t> order;

        inline float coord(uint32_t i, int k) const
        {
            return pts[3 * i + k];
        }

        // squared distance from point to the axis-aligned cell
        inline float cell_dist_sq(uint32_t id, const float *lo, const float *hi) const
        {
            float acc = 0;
            for (int k = 0; k < 3; k++)
            {
                float c = coord(id, k);
                float d = std::max({lo[k] - c, 0.0F, c - hi[k]});
                acc += d * d;
            }
            return acc;
        }

        void subdivide(
            uint32_t begin,
            uint32_t count,
            uint32_t ti,
            std::vector<uint32_t> afford,
            float lo[3],
            float hi[3],
            int d)
        {
            if (count == 1)
            {
                const uint32_t z = ti - (n_pad - 1);
                const uint32_t rep = order[begin];
                auto &lst = leaf_lists[z];
                if (std::isfinite(coord(rep, 0)))
                {
                    const float lim = max_aff_l1 * max_aff_l1;
                    lst.push_back(rep);
                    std::unordered_set<uint32_t> seen{rep};
                    for (uint32_t id : afford)
                    {
                        if (std::isfinite(coord(id, 0)) && !seen.count(id) &&
                            cell_dist_sq(id, lo, hi) <= lim)
                        {
                            lst.push_back(id);
                            seen.insert(id);
                        }
                    }
                }
                return;
            }

            auto *begin_it = order.data() + begin;
            std::sort(
                begin_it, begin_it + count,
                [this, d](uint32_t a, uint32_t b) { return coord(a, d) < coord(b, d); });
            const uint32_t half = count / 2;
            float test = (coord(order[begin + half - 1], d) + coord(order[begin + half], d)) / 2.0F;
            if (!std::isfinite(test))
            {
                test = FAR;
            }
            tests[ti] = test;

            std::vector<uint32_t> lo_aff, hi_aff;
            lo_aff.reserve(afford.size());
            hi_aff.reserve(afford.size());
            for (uint32_t id : afford)
            {
                const float c = coord(id, d);
                if (c <= test + max_aff_l1)
                {
                    lo_aff.push_back(id);
                }
                if (c >= test - max_aff_l1)
                {
                    hi_aff.push_back(id);
                }
            }
            // points crossing from the sibling half
            for (uint32_t i = begin + half; i < begin + count; i++)
            {
                const uint32_t id = order[i];
                if (std::isfinite(coord(id, d)) && coord(id, d) <= test + max_aff_l1)
                {
                    lo_aff.push_back(id);
                }
            }
            for (uint32_t i = begin; i < begin + half; i++)
            {
                const uint32_t id = order[i];
                if (std::isfinite(coord(id, d)) && coord(id, d) >= test - max_aff_l1)
                {
                    hi_aff.push_back(id);
                }
            }

            float lo_hi[3] = {hi[0], hi[1], hi[2]};
            float hi_lo[3] = {lo[0], lo[1], lo[2]};
            lo_hi[d] = test;
            hi_lo[d] = test;
            const int nd = (d + 1) % 3;
            subdivide(begin, half, 2 * ti + 1, std::move(lo_aff), lo, lo_hi, nd);
            subdivide(begin + half, count - half, 2 * ti + 2, std::move(hi_aff), hi_lo, hi, nd);
        }
    };
}  // namespace

extern "C"
{
    // Pass 1: build the tree and report the max leaf occupancy.
    // Returns a handle (heap pointer) or nullptr.
    void *capt_build_start(
        const float *points,  // (n, 3)
        uint32_t n,
        float r_max,
        float r_point,
        uint32_t *out_nlog2,
        uint32_t *out_max_aff)
    {
        if (n == 0)
        {
            return nullptr;
        }
        uint32_t nlog2 = 0;
        while ((1u << nlog2) < n)
        {
            nlog2++;
        }
        const uint32_t n_pad = 1u << nlog2;

        auto *b = new Builder();
        auto *padded = new float[3 * n_pad];
        for (uint32_t i = 0; i < 3 * n; i++)
        {
            padded[i] = points[i];
        }
        for (uint32_t i = 3 * n; i < 3 * n_pad; i++)
        {
            padded[i] = std::numeric_limits<float>::infinity();
        }
        b->pts = padded;
        b->n_pad = n_pad;
        b->max_aff_l1 = r_max + r_point;
        b->tests.assign(std::max(n_pad - 1, 1u), FAR);
        b->leaf_lists.assign(n_pad, {});
        b->order.resize(n_pad);
        for (uint32_t i = 0; i < n_pad; i++)
        {
            b->order[i] = i;
        }

        std::vector<uint32_t> all(n);
        for (uint32_t i = 0; i < n; i++)
        {
            all[i] = i;
        }
        float lo[3] = {-FAR, -FAR, -FAR};
        float hi[3] = {FAR, FAR, FAR};
        b->subdivide(0, n_pad, 0, std::move(all), lo, hi, 0);

        uint32_t max_aff = 1;
        for (const auto &lst : b->leaf_lists)
        {
            max_aff = std::max(max_aff, static_cast<uint32_t>(lst.size()));
        }
        *out_nlog2 = nlog2;
        *out_max_aff = max_aff;
        return b;
    }

    // Pass 2: fill caller-allocated output buffers and free the handle.
    // tests_out: (n_pad - 1,); leaf_points_out: (n_pad, max_aff, 3) FAR-filled
    // by callee; leaf_aabb_out: (n_pad, 2, 3).
    void capt_build_finish(
        void *handle,
        float *tests_out,
        float *leaf_points_out,
        float *leaf_aabb_out,
        uint32_t max_aff)
    {
        auto *b = static_cast<Builder *>(handle);
        const uint32_t n_pad = b->n_pad;
        std::memcpy(tests_out, b->tests.data(), sizeof(float) * std::max(n_pad - 1, 1u));
        for (uint32_t z = 0; z < n_pad; z++)
        {
            const auto &lst = b->leaf_lists[z];
            float *leaf = leaf_points_out + static_cast<size_t>(z) * max_aff * 3;
            for (uint32_t j = 0; j < max_aff * 3; j++)
            {
                leaf[j] = FAR;
            }
            float lo[3] = {FAR, FAR, FAR};
            float hi[3] = {FAR, FAR, FAR};
            if (!lst.empty())
            {
                lo[0] = lo[1] = lo[2] = std::numeric_limits<float>::infinity();
                hi[0] = hi[1] = hi[2] = -std::numeric_limits<float>::infinity();
                for (uint32_t j = 0; j < lst.size(); j++)
                {
                    for (int k = 0; k < 3; k++)
                    {
                        const float c = b->coord(lst[j], k);
                        leaf[j * 3 + k] = c;
                        lo[k] = std::min(lo[k], c);
                        hi[k] = std::max(hi[k], c);
                    }
                }
            }
            for (int k = 0; k < 3; k++)
            {
                leaf_aabb_out[z * 6 + k] = lo[k];
                leaf_aabb_out[z * 6 + 3 + k] = hi[k];
            }
        }
        delete[] b->pts;
        delete b;
    }

    // Pointcloud filter: range/workcell cull + voxel-grid min-distance dedup
    // (first point per voxel wins). Returns the number of kept points,
    // written densely into out (capacity n).
    uint32_t filter_pointcloud_native(
        const float *points,
        uint32_t n,
        float min_dist,
        float max_range,
        const float *origin,
        const float *workcell_min,
        const float *workcell_max,
        int cull,
        float *out)
    {
        std::unordered_set<uint64_t> seen;
        seen.reserve(n * 2);
        uint32_t m = 0;
        const float inv = min_dist > 0 ? 1.0F / min_dist : 0.0F;
        for (uint32_t i = 0; i < n; i++)
        {
            const float x = points[3 * i], y = points[3 * i + 1], z = points[3 * i + 2];
            if (cull)
            {
                const float dx = x - origin[0], dy = y - origin[1], dz = z - origin[2];
                if (dx * dx + dy * dy + dz * dz > max_range * max_range)
                {
                    continue;
                }
                if (x < workcell_min[0] || y < workcell_min[1] || z < workcell_min[2] ||
                    x > workcell_max[0] || y > workcell_max[1] || z > workcell_max[2])
                {
                    continue;
                }
            }
            if (min_dist > 0)
            {
                const auto cx = static_cast<int64_t>(std::floor(x * inv));
                const auto cy = static_cast<int64_t>(std::floor(y * inv));
                const auto cz = static_cast<int64_t>(std::floor(z * inv));
                const uint64_t key = (static_cast<uint64_t>(cx) * 73856093ULL) ^
                                     (static_cast<uint64_t>(cy) * 19349663ULL) ^
                                     (static_cast<uint64_t>(cz) * 83492791ULL);
                if (!seen.insert(key).second)
                {
                    continue;
                }
            }
            out[3 * m] = x;
            out[3 * m + 1] = y;
            out[3 * m + 2] = z;
            m++;
        }
        return m;
    }
}
