#!/bin/bash
# Build the native runtime components.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -fPIC -shared -pthread \
    frame_loader.cpp imu_preint.cpp feed_pack.cpp -o libgfs_native.so -lz
echo "built native/libgfs_native.so"
