#!/bin/bash
# Build the reference genotyper as a test oracle, compiling its sources
# straight from /root/reference against our shims (sdsl/KMC/htslib).
# Output: $1 (default /tmp/malva_oracle/malva-geno-oracle)
set -e
REF=${MALVA_REFERENCE:-/root/reference}
OUT_DIR=$(dirname "${1:-/tmp/malva_oracle/malva-geno-oracle}")
OUT=${1:-/tmp/malva_oracle/malva-geno-oracle}
SHIMS=$(dirname "$0")/shims
mkdir -p "$OUT_DIR"
g++ -std=c++17 -O2 \
    -I "$SHIMS" -I "$REF" \
    "$REF/main.cpp" "$REF/xxhash.c" "$REF/zstdstream.cpp" \
    -lz -lzstd \
    -o "$OUT"
echo "$OUT"
