#pragma once
#include <sstream>
#include <string>
namespace absl {
inline void StrCatInto(std::ostringstream&) {}
template <typename T, typename... R>
void StrCatInto(std::ostringstream& os, const T& v, const R&... rest) {
  os << v;
  StrCatInto(os, rest...);
}
template <typename... A>
std::string StrCat(const A&... args) {
  std::ostringstream os;
  StrCatInto(os, args...);
  return os.str();
}
}  // namespace absl
