#!/bin/sh
# Build the native decode library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libcpsd_native.so beam.cpp
echo "built $(pwd)/libcpsd_native.so"
