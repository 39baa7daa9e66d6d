// Stub of the nigh nearest-neighbor library (CPM-fetched in the reference
// build, not vendored). Provides an exact linear-scan implementation with the
// same query semantics as a kd-tree exact search (identical results up to
// distance ties), so reference planners run unmodified for golden fixtures.
#pragma once

namespace unc::robotics::nigh
{
    struct NoThreadSafety
    {
    };

    template <unsigned batch>
    struct KDTreeBatch
    {
    };

    namespace metric
    {
        template <typename T, typename M>
        struct Space;

        template <int p>
        struct LP
        {
        };
    }  // namespace metric
}  // namespace unc::robotics::nigh
