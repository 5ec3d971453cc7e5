#!/bin/bash
# Build the C reference (mounted read-only at /root/reference) against the
# local fftw shim, producing the differential-test oracle binary at
# $OUT (default /tmp/refbuild/iridium-sniffer-ref).
set -e
REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUTDIR=${OUTDIR:-/tmp/refbuild}
OUT=${OUT:-$OUTDIR/iridium-sniffer-ref}
mkdir -p "$OUTDIR"

SRCS="main.c options.c burst_detect.c burst_downmix.c qpsk_demod.c \
      fir_filter.c window_func.c simd_generic.c simd_avx2.c \
      frame_decode.c ida_decode.c frame_output.c gsmtap.c web_map.c \
      doppler_pos.c sbd_acars.c"

cd "$REF"
gcc -O2 -std=gnu11 -mavx2 -mfma -I"$HERE" -o "$OUT" \
    $SRCS "$HERE/fftw_shim.c" -lm -lpthread
echo "built $OUT"
