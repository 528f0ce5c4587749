#!/bin/sh
# Build the native host runtime (thread pool + BMP encoder) into a shared
# library next to this script. Requires only g++; takes ~2s.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared -pthread -o libpt_native.so src/pt_native.cpp
echo "built $(pwd)/libpt_native.so"
