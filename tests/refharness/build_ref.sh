#!/bin/bash
# Build the reference ngsDist binary from the read-only checkout at
# /root/reference, for golden-output generation and CPU baseline
# benchmarking.  Compiles the reference sources in place (no copies) and
# substitutes the GSL RNG with the local taus shim (gslshim/).
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${REF:-/root/reference}"
OUT="$HERE/build"
mkdir -p "$OUT"

if [ -x "$OUT/ngsDist_ref" ] && [ "$OUT/ngsDist_ref" -nt "$HERE/gslshim/gsl/gsl_rng.h" ]; then
    exit 0
fi

CXXFLAGS="-O3 -Wall -I$HERE/gslshim -I$REF -I$REF/shared"
g++ $CXXFLAGS -x c++ -c "$REF/shared/threadpool.c" -o "$OUT/threadpool.o"
g++ $CXXFLAGS -c "$REF/shared/gen_func.cpp"  -o "$OUT/gen_func.o"
g++ $CXXFLAGS -c "$REF/shared/read_data.cpp" -o "$OUT/read_data.o"
g++ $CXXFLAGS -c "$REF/parse_args.cpp"       -o "$OUT/parse_args.o"
g++ $CXXFLAGS -c "$REF/ngsDist.cpp"          -o "$OUT/ngsDist.o"
g++ "$OUT"/threadpool.o "$OUT"/gen_func.o "$OUT"/read_data.o \
    "$OUT"/parse_args.o "$OUT"/ngsDist.o -lz -lpthread -o "$OUT/ngsDist_ref"
echo "built $OUT/ngsDist_ref"
