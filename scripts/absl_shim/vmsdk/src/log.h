// Shim: the vendored hnswlib logs a rate-limited warning; drop it.
#pragma once
#include <sstream>
namespace vmsdk_shim {
struct NullLog {
  template <typename T>
  NullLog& operator<<(const T&) { return *this; }
};
}  // namespace vmsdk_shim
#define VMSDK_LOG_EVERY_N_SEC(...) vmsdk_shim::NullLog()
#define VMSDK_LOG(...) vmsdk_shim::NullLog()
