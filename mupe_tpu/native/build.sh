#!/bin/sh
# Build the native host-side components into libmupe_native.so
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libmupe_native.so easy_tasks.cpp
echo "built $(pwd)/libmupe_native.so"
