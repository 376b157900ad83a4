#!/bin/sh
# Build the native host library. Output lands next to this script, with a
# .srchash sidecar recording the source hash (stnerf_tpu.data.native refuses
# repo-local binaries whose sidecar does not match the current source).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o libstnerf_host.so stnerf_host.cpp
sha256sum stnerf_host.cpp | cut -d' ' -f1 > libstnerf_host.so.srchash
echo "built $(pwd)/libstnerf_host.so"
