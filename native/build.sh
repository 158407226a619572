#!/bin/sh
# Build the native runtime pieces into adaptigraph_tpu/native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../adaptigraph_tpu/native
g++ -O2 -shared -fPIC -std=c++17 shm_ring.cpp -o ../adaptigraph_tpu/native/libshm_ring.so
g++ -O3 -shared -fPIC -std=c++17 fps.cpp -o ../adaptigraph_tpu/native/libfps.so
echo "built libshm_ring.so libfps.so"
