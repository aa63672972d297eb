// Minimal absl shim for compiling the REFERENCE's vendored hnswlib as a
// measurement baseline (scripts/ref_baseline.py). The real build fetches
// abseil from the network (submodules/CMakeLists.txt), which this
// environment blocks; the vendored headers use only this tiny surface.
#pragma once
#include <string>
#include <string_view>
namespace absl {
using string_view = std::string_view;
class Status {
 public:
  Status() : ok_(true) {}
  Status(bool ok, std::string msg) : ok_(ok), msg_(std::move(msg)) {}
  bool ok() const { return ok_; }
  const std::string& message() const { return msg_; }
  std::string ToString() const { return msg_; }
 private:
  bool ok_;
  std::string msg_;
};
inline Status OkStatus() { return Status(); }
inline Status InternalError(string_view m) {
  return Status(false, std::string(m));
}
}  // namespace absl
