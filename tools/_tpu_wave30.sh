#!/bin/bash
# Wave 30 (round 4): attribute today's 18.7 ms packed ViT forward.
# Source-attributed traces of the packed fwd with the block-space decoder
# off/on, plus the spatial fwd for comparison.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave30] A: packed fwd trace, stage decoder (gate 0)"
ANATOMIX_DECODER_BLOCK=0 timeout 1200 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w30_trpacked0.log 2>&1
echo "[wave30] A rc=$?"
sleep 10

echo "[wave30] B: packed fwd trace, block-space decoder (gate 1)"
ANATOMIX_DECODER_BLOCK=1 timeout 1200 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w30_trpacked1.log 2>&1
echo "[wave30] B rc=$?"
sleep 10

echo "[wave30] C: spatial fwd trace (gate 0) for the relayout delta"
ANATOMIX_DECODER_BLOCK=0 timeout 1200 python tools/_trace_attrib.py vit \
  > tools/logs/w30_trspatial.log 2>&1
echo "[wave30] C rc=$?"
echo "[wave30] done"

echo "[wave30] D: flash rectangular-block + splash sweep"
timeout 2400 python tools/_exp_flashblk.py > tools/logs/w30_flash.log 2>&1
echo "[wave30] D rc=$?"
echo "[wave30] done2"
