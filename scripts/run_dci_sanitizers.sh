#!/bin/bash
# Sanitizer harness for the native DCI library (SURVEY.md §5: the reference
# had no sanitizer coverage; its only concurrency-safety code was the tf_dci
# mutex pair). Builds the C++ core with ASan (and TSan when requested) and
# runs a construction+query workload incl. the OpenMP-parallel query path.
set -euo pipefail
cd "$(dirname "$0")/.."

SAN="${1:-address}"   # address | thread | undefined
SRC=inclusivegan_tpu/dci/csrc
OUT=$(mktemp -d)

cat > "$OUT/driver.cpp" <<'EOF'
#include "dci.hpp"
#include <cstdio>
#include <random>
#include <vector>

int main() {
  const int dim = 48, n = 3000, nq = 64, k = 4;
  std::mt19937_64 rng(0);
  std::normal_distribution<double> nd;
  // low intrinsic dimension so the index has structure
  std::vector<double> basis(6 * dim);
  for (auto& v : basis) v = nd(rng);
  std::vector<double> data(static_cast<size_t>(n) * dim, 0.0);
  for (int i = 0; i < n; ++i) {
    double coef[6];
    for (double& c : coef) c = nd(rng);
    for (int d = 0; d < dim; ++d)
      for (int j = 0; j < 6; ++j)
        data[static_cast<size_t>(i) * dim + d] += coef[j] * basis[j * dim + d];
  }
  dci::Index index(dim, 2, 7, /*seed=*/1);
  index.add(n, data.data(), nullptr, /*num_levels=*/2);

  dci::QueryOptions opt;
  opt.num_neighbours = k;
  opt.max_retrieve = 200;
  opt.max_visits = 4000;
  opt.field_of_view = 8;
  std::vector<int> ids(nq * k), counts(nq);
  std::vector<double> dists(nq * k);
  index.query(nq, data.data(), nullptr, opt, ids.data(), dists.data(),
              counts.data());
  int self_hits = 0;
  for (int i = 0; i < nq; ++i)
    if (counts[i] > 0 && ids[i * k] == i) ++self_hits;
  std::printf("self-NN recall: %d/%d\n", self_hits, nq);
  index.clear();
  index.reset(7);
  index.add(n / 2, data.data(), nullptr, 1);
  index.query(8, data.data(), nullptr, opt, ids.data(), dists.data(),
              counts.data());
  std::printf("sanitizer workload done\n");
  return self_hits == nq ? 0 : 1;
}
EOF

g++ -O1 -g -std=c++17 -fopenmp "-fsanitize=$SAN" -fno-omit-frame-pointer \
    -I "$SRC" "$SRC/dci.cpp" "$OUT/driver.cpp" -o "$OUT/dci_san"
echo "running under $SAN sanitizer..."
"$OUT/dci_san"
echo "SANITIZER ($SAN): CLEAN"
