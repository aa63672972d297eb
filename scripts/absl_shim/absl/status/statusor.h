#pragma once
#include <cassert>
#include <optional>
#include <utility>
#include "absl/status/status.h"
namespace absl {
template <typename T>
class StatusOr {
 public:
  StatusOr(Status s) : status_(std::move(s)) {}
  StatusOr(T v) : status_(OkStatus()), value_(std::move(v)) {}
  bool ok() const { return status_.ok(); }
  const Status& status() const { return status_; }
  T& value() { return *value_; }
  const T& value() const { return *value_; }
  T& operator*() { return *value_; }
  const T& operator*() const { return *value_; }
  T* operator->() { return &*value_; }
 private:
  Status status_;
  std::optional<T> value_;
};
}  // namespace absl
