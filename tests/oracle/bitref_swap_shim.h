// Force-included when building the reference's old_files apps: the old
// code calls qualified std::swap on vector<bool> proxy references
// (old_files/include/mwvc/reduction_graph.hpp:491).  In this libstdc++
// (GCC 12) that overload is a HIDDEN FRIEND of _Bit_reference — visible
// to ADL only — so the qualified call no longer resolves.  Re-declaring
// it at namespace scope restores visibility without patching the
// read-only reference tree (the in-class friend remains the definition).
#pragma once
#include <vector>
namespace std {
void swap(std::_Bit_reference __x, std::_Bit_reference __y) noexcept;
}  // namespace std
