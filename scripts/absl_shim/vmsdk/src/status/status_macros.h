// Shim for the reference's vmsdk status macros (measurement build only —
// see scripts/ref_baseline.py). Provides just the two macros the vendored
// hnswlib headers expand.
#pragma once
#include "absl/status/status.h"
#include "absl/status/statusor.h"

#define VMSDK_STATUS_CAT_(a, b) a##b
#define VMSDK_STATUS_CAT(a, b) VMSDK_STATUS_CAT_(a, b)

#define VMSDK_RETURN_IF_ERROR(expr)                  \
  do {                                               \
    auto _vmsdk_st = (expr);                         \
    if (!_vmsdk_st.ok()) return _vmsdk_st;           \
  } while (0)

#define VMSDK_ASSIGN_OR_RETURN(lhs, rexpr)                         \
  auto VMSDK_STATUS_CAT(_vmsdk_sor_, __LINE__) = (rexpr);          \
  if (!VMSDK_STATUS_CAT(_vmsdk_sor_, __LINE__).ok())               \
    return VMSDK_STATUS_CAT(_vmsdk_sor_, __LINE__).status();       \
  lhs = std::move(*VMSDK_STATUS_CAT(_vmsdk_sor_, __LINE__))
