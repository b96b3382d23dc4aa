// Oracle for procgen_tpu/utils/cppsort.py: the exact permutation
// libstdc++'s std::sort applies under a key-only comparator (ties
// included).  Reads "<n> <desc> k0 k1 ..." from argv-style stdin, prints
// the original index of each element in sorted order.
#include <algorithm>
#include <cstdio>
#include <utility>
#include <vector>

int main() {
    int n, desc;
    if (scanf("%d %d", &n, &desc) != 2)
        return 1;
    std::vector<std::pair<long long, int>> v(n);
    for (int i = 0; i < n; i++) {
        long long k;
        scanf("%lld", &k);
        v[i] = {k, i};
    }
    if (desc)
        std::sort(v.begin(), v.end(),
                  [](const std::pair<long long, int> &a,
                     const std::pair<long long, int> &b) { return a.first > b.first; });
    else
        std::sort(v.begin(), v.end(),
                  [](const std::pair<long long, int> &a,
                     const std::pair<long long, int> &b) { return a.first < b.first; });
    for (int i = 0; i < n; i++)
        printf("%d\n", v[i].second);
    return 0;
}
