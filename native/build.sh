#!/bin/sh
# Build the native oracle shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -Wall -Wextra -o libcppns_oracle.so cppns_oracle.cc
echo "built $(pwd)/libcppns_oracle.so"
