#!/usr/bin/env bash
# Build the native fast image loader (JPEG decode + resize + normalize).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -pthread \
    fastloader.cpp -ljpeg -o libfastloader.so
echo "built $(pwd)/libfastloader.so"
