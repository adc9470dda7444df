#!/bin/sh
# Build the native IO library into the Python package.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -o ../satlas_sr_tpu/utils/_pngio.so pngio.cpp -lpng -lz
echo "built satlas_sr_tpu/utils/_pngio.so"
