#!/bin/bash
# Build the reference test oracles into /tmp/gnn_mwvc_oracle (never into the
# repo or the read-only reference mount).  Oracles:
#   GNN_VC           — the unmodified reference solver binary (differential runs)
#   dump_activations — our harness over the reference inference code
# Requires only g++; OpenBLAS is replaced by tests/oracle/cblas.h.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/gnn_mwvc_oracle}
HERE="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$OUT"

# -include tuple: reference headers use std::tuple without including <tuple>
# (compiles under older libstdc++); force-include instead of patching the
# read-only reference.
CXXFLAGS="-std=c++17 -O2 -march=native -DNDEBUG -include tuple -I$HERE -I$REF/include"

if [ ! -x "$OUT/GNN_VC" ] || [ "$1" = "-f" ]; then
  g++ $CXXFLAGS -o "$OUT/GNN_VC" \
    "$REF/src/GNN_VC.cpp" "$REF/src/matrix.cpp" "$REF/src/gnn_inference.cpp"
fi

if [ ! -x "$OUT/dump_activations" ] || [ "$1" = "-f" ]; then
  g++ $CXXFLAGS -o "$OUT/dump_activations" \
    "$HERE/dump_activations.cpp" "$REF/src/matrix.cpp" "$REF/src/gnn_inference.cpp"
fi

# bench_predict: link a real OpenBLAS if one is findable (opencv bundles one)
# so the reference CPU baseline is fair; otherwise use the naive shim.
OBLAS=$(ls /opt/venv/lib/python3.12/site-packages/opencv_python.libs/libopenblas*.so 2>/dev/null | head -1)
if [ ! -x "$OUT/bench_predict" ] || [ "$1" = "-f" ]; then
  if [ -n "$OBLAS" ]; then
    g++ -std=c++17 -O3 -march=native -DNDEBUG -include tuple \
      -I"$HERE/cblas_real" -I"$REF/include" \
      -o "$OUT/bench_predict" "$HERE/bench_predict.cpp" \
      "$REF/src/matrix.cpp" "$REF/src/gnn_inference.cpp" \
      "$OBLAS" -Wl,-rpath,"$(dirname "$OBLAS")"
  else
    g++ $CXXFLAGS -o "$OUT/bench_predict" "$HERE/bench_predict.cpp" \
      "$REF/src/matrix.cpp" "$REF/src/gnn_inference.cpp"
  fi
fi

if [ ! -x "$OUT/ls_oracle" ] || [ "$1" = "-f" ]; then
  g++ $CXXFLAGS -o "$OUT/ls_oracle" "$HERE/ls_oracle.cpp"
fi

# Comparison-solver baselines (differential quality runs; same METIS input).
for S in DynWVC2 FastWVC; do
  if [ ! -x "$OUT/$S" ] || [ "$1" = "-f" ]; then
    g++ -std=c++17 -O2 -march=native -DNDEBUG \
      -o "$OUT/$S" "$REF/other_solvers/$S/mwvc.cpp"
  fi
done
if [ ! -x "$OUT/NuMWVC" ] || [ "$1" = "-f" ]; then
  # "C" source includes <vector>; compile as C++ like its original makefile
  g++ -x c++ -O2 -march=native -DNDEBUG \
    -o "$OUT/NuMWVC" "$REF/other_solvers/NuMWVC/wvcp_0123.c" 2>/dev/null \
    || echo "NuMWVC build skipped"
fi
if [ ! -x "$OUT/HILS" ] || [ "$1" = "-f" ]; then
  g++ -std=c++17 -O2 -march=native -DNDEBUG \
    -o "$OUT/HILS" "$REF"/other_solvers/HILS/*.cpp 2>/dev/null \
    || echo "HILS build skipped"
fi

# fastWVC_tuned (old_files legacy app; differential gate for the
# mwvc-baseline fastwvc-tuned subcommand).  bitref_swap_shim.h restores
# the qualified std::swap(vector<bool>::reference, ...) the old code
# relies on (hidden friend in modern libstdc++).
if [ ! -x "$OUT/fastWVC_tuned" ] || [ "$1" = "-f" ]; then
  g++ -std=c++17 -O2 -march=native -DNDEBUG \
    -include "$HERE/bitref_swap_shim.h" -include tuple \
    -I"$REF/old_files/include/mwvc" \
    -o "$OUT/fastWVC_tuned" "$REF/old_files/src/apps/fastWVC_tuned.cpp" \
    || echo "fastWVC_tuned build skipped"
fi

echo "$OUT"
