#!/bin/bash
# Kernel cost attribution on the real TPU: re-times the fused train step
# (compile_probe "big" stage) with individual kernel stages ablated via
# GSPLAT_ABLATE (see raster_tiled._ABLATE).  Each variant is a fresh
# compile; run sequentially (never two TPU processes at once).
set -u
cd "$(dirname "$0")/.."
STAGE="${1:-big}"
for ab in "" exp log cumsum exp,log,cumsum; do
  echo "=== ablate='${ab}' ==="
  GSPLAT_ABLATE="$ab" timeout 2400 python -u scripts/compile_probe.py "$STAGE"
done
