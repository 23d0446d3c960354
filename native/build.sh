#!/bin/bash
# Build the native pipeline core.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -funroll-loops -fPIC -shared -o libmsa_pipeline.so pipeline_core.cpp
echo "built native/libmsa_pipeline.so"
