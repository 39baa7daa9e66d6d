// Stub for the pdqsort dependency (fetched via CPM in the reference build).
// std::sort is a behavioral drop-in for golden-fixture generation; only CAPT
// build order could differ for equal keys, which the fixtures don't exercise.
#pragma once
#include <algorithm>

template <typename It>
void pdqsort_branchless(It begin, It end)
{
    std::sort(begin, end);
}

template <typename It, typename Cmp>
void pdqsort_branchless(It begin, It end, Cmp cmp)
{
    std::sort(begin, end, cmp);
}

template <typename It>
void pdqsort(It begin, It end)
{
    std::sort(begin, end);
}

template <typename It, typename Cmp>
void pdqsort(It begin, It end, Cmp cmp)
{
    std::sort(begin, end, cmp);
}
