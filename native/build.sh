#!/bin/bash
# Build the native components:
#   libafter_record_store.so  — mmap record-store reader (ctypes binding)
#   stream_host               — PJRT C API streaming host (nn~ equivalent)
set -e
cd "$(dirname "$0")"

TF_INCLUDE=${TF_INCLUDE:-/opt/venv/lib/python3.12/site-packages/tensorflow/include}

g++ -O2 -std=c++17 -shared -fPIC -o libafter_record_store.so record_store.cc
echo "built libafter_record_store.so"

g++ -O2 -std=c++17 -I"$TF_INCLUDE" -o stream_host stream_host.cc -ldl
echo "built stream_host"
