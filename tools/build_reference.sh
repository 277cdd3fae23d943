#!/bin/sh
# Build the reference ChaissonLab/lra binary from /root/reference using
# the clean-room htslib stubs (FASTA/FASTQ path; BAM input disabled).
# Usage: tools/build_reference.sh [outdir]
set -e
OUT="${1:-/tmp/lra_ref_bench}"
STUB="$(dirname "$0")/htslib_stub"
mkdir -p "$OUT"
g++ -O2 -std=c++14 -DNDEBUG -I "$STUB" /root/reference/lra.cpp \
    -o "$OUT/lra" -lz -lpthread
echo "built $OUT/lra"
