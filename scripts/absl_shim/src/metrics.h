// Shim of src/metrics.h for the baseline measurement build: the vendored
// hnswlib only touches GetStats().reclaimable_memory.
#pragma once
#include <atomic>
#include <cstdint>
namespace valkey_search {
struct Metrics {
  struct Stats {
    std::atomic<int64_t> reclaimable_memory{0};
  };
  static Stats& GetStats() {
    static Stats s;
    return s;
  }
};
}  // namespace valkey_search
