// Measurement harness for the REFERENCE's own ANN engine: compiles the
// vendored hnswlib from /root/reference/third_party/hnswlib (the exact
// code valkey-search serves with — including its SimSIMD dispatch and the
// VALKEYSEARCH ef_runtime search overload) and times build + search on
// the bench corpus. This is the head-to-head baseline BASELINE.md calls
// for; the full server build is network-blocked (gRPC/absl FetchContent),
// so the engine is measured directly. Nothing here is copied into the
// framework — the reference headers are included read-only at compile
// time, with a ~100-line absl shim (scripts/absl_shim) standing in for
// the blocked abseil fetch.
//
// Usage: ref_hnsw_baseline CORPUS.f32 QUERIES.f32 N D NQ M EFC K GT.i64
// Prints one JSON line with build rate, per-ef QPS + recall@10, and the
// reference brute-force scan QPS (single thread each — this host has one
// core; the reference's own benchmarks scale linearly with cores).

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <queue>
#include <vector>

#include "hnswlib.h"

using clk = std::chrono::steady_clock;

static double secs(clk::time_point a, clk::time_point b) {
  return std::chrono::duration<double>(b - a).count();
}

static std::vector<char> read_file(const char* path, size_t bytes) {
  std::vector<char> buf(bytes);
  FILE* f = fopen(path, "rb");
  if (!f || fread(buf.data(), 1, bytes, f) != bytes) {
    fprintf(stderr, "read failed: %s\n", path);
    exit(1);
  }
  fclose(f);
  return buf;
}

int main(int argc, char** argv) {
  if (argc < 10) {
    fprintf(stderr, "args: corpus queries N D NQ M EFC K gt\n");
    return 1;
  }
  const char* corpus_path = argv[1];
  const char* queries_path = argv[2];
  const size_t n = strtoull(argv[3], nullptr, 10);
  const size_t d = strtoull(argv[4], nullptr, 10);
  const size_t nq = strtoull(argv[5], nullptr, 10);
  const size_t m = strtoull(argv[6], nullptr, 10);
  const size_t efc = strtoull(argv[7], nullptr, 10);
  const size_t k = strtoull(argv[8], nullptr, 10);
  const char* gt_path = argv[9];

  auto corpus_buf = read_file(corpus_path, n * d * 4);
  auto query_buf = read_file(queries_path, nq * d * 4);
  auto gt_buf = read_file(gt_path, nq * k * 8);
  const float* corpus = (const float*)corpus_buf.data();
  const float* queries = (const float*)query_buf.data();
  const int64_t* gt = (const int64_t*)gt_buf.data();

  hnswlib::L2Space space(d);

  // ---- reference brute-force scan (bruteforce.h SIMD loop) ----
  double bf_qps = 0;
  {
    hnswlib::BruteforceSearch<float> bf(&space, n);
    for (size_t i = 0; i < n; ++i) bf.addPoint(corpus + i * d, i);
    const size_t probes = nq < 16 ? nq : 16;
    auto t0 = clk::now();
    for (size_t i = 0; i < probes; ++i)
      bf.searchKnn(queries + i * d, k);
    bf_qps = probes / secs(t0, clk::now());
  }

  // ---- reference HNSW: build then ef sweep ----
  hnswlib::HierarchicalNSW<float> hnsw(&space, n, m, efc);
  auto t0 = clk::now();
  for (size_t i = 0; i < n; ++i) hnsw.addPoint(corpus + i * d, i);
  const double build_s = secs(t0, clk::now());

  printf("{\"build_s\": %.2f, \"build_vecs_per_s\": %.1f, "
         "\"bruteforce_qps_1core\": %.2f, \"sweep\": {",
         build_s, n / build_s, bf_qps);
  const size_t efs[] = {10, 50, 100};
  for (int e = 0; e < 3; ++e) {
    hnsw.setEf(efs[e]);
    // recall over all queries
    size_t hits = 0;
    auto t1 = clk::now();
    for (size_t i = 0; i < nq; ++i) {
      auto pq = hnsw.searchKnn(queries + i * d, k);
      while (!pq.empty()) {
        const int64_t label = (int64_t)pq.top().second;
        pq.pop();
        for (size_t j = 0; j < k; ++j)
          if (gt[i * k + j] == label) {
            ++hits;
            break;
          }
      }
    }
    const double el = secs(t1, clk::now());
    printf("%s\"%zu\": [%.1f, %.4f]", e ? ", " : "", efs[e], nq / el,
           (double)hits / (double)(nq * k));
  }
  printf("}}\n");
  return 0;
}
