#!/bin/sh
# Build the native data loader: native/build.sh [outdir]
set -e
cd "$(dirname "$0")"
OUT="${1:-.}"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    loader.cpp -o "$OUT/libyolodata.so" -ljpeg -lpng -lpthread
echo "built $OUT/libyolodata.so"
