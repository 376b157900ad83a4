#!/bin/sh
# Build the native host library. Output lands next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o libstnerf_host.so stnerf_host.cpp
echo "built $(pwd)/libstnerf_host.so"
