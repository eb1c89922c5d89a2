#!/bin/sh
# Build the native slide reader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o _ndpi_reader.so ndpi_reader.cc \
    -ljpeg -lz -lpthread
echo "built $(pwd)/_ndpi_reader.so"
