// Linear-scan "Nigh" with the subset of the API the reference planners use:
// insert, size, nearest(key) and nearest(out, key, k, r). Exact search, so it
// is behavior-identical to the real kd-tree except on exact distance ties.
#pragma once

#include <algorithm>
#include <cstddef>
#include <limits>
#include <optional>
#include <utility>
#include <vector>

#include <nigh/nigh_forward.hpp>

namespace unc::robotics::nigh
{
    template <typename T, typename SpaceT, typename KeyFn, typename Concurrency, typename Strategy>
    class Nigh
    {
        std::vector<T> items_;
        KeyFn key_;

    public:
        void insert(const T &item)
        {
            items_.push_back(item);
        }

        [[nodiscard]] std::size_t size() const
        {
            return items_.size();
        }

        template <typename Key>
        std::optional<std::pair<T, float>> nearest(const Key &key) const
        {
            if (items_.empty())
            {
                return std::nullopt;
            }
            float best = std::numeric_limits<float>::infinity();
            std::size_t best_i = 0;
            for (std::size_t i = 0; i < items_.size(); ++i)
            {
                float d = SpaceT::distance(key_(items_[i]), key);
                if (d < best)
                {
                    best = d;
                    best_i = i;
                }
            }
            return std::make_pair(items_[best_i], best);
        }

        template <typename Key>
        void nearest(
            std::vector<std::pair<T, float>> &out,
            const Key &key,
            std::size_t k,
            float r = std::numeric_limits<float>::infinity()) const
        {
            out.clear();
            for (std::size_t i = 0; i < items_.size(); ++i)
            {
                float d = SpaceT::distance(key_(items_[i]), key);
                if (d <= r)
                {
                    out.emplace_back(items_[i], d);
                }
            }
            std::sort(
                out.begin(), out.end(), [](const auto &a, const auto &b) { return a.second < b.second; });
            if (out.size() > k)
            {
                out.resize(k);
            }
        }
    };
}  // namespace unc::robotics::nigh
