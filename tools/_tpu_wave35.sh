#!/bin/bash
# Wave 35 (round 5 opener): validate the cat+flat default flip
# (eligibility-guarded), measure the dev sliding it unlocks, and capture
# the fresh attributions the round-5 targets need (ViT packed fwd,
# pretrain step, dev fwd with the new defaults).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave35] A: cat kernel probe (eligibility guard + parity)"
timeout 1800 python tools/_probe_cat.py > tools/logs/w35_probecat.log 2>&1
rc_a=$?
echo "[wave35] A rc=$rc_a"
sleep 10

echo "[wave35] B: dev fwd A/B (defaults now cat+flat)"
timeout 2400 python tools/_exp_devfwd_ab.py > tools/logs/w35_devab.log 2>&1
echo "[wave35] B rc=$?"
sleep 10

echo "[wave35] C: dev sliding 256 (new defaults)"
timeout 1800 python tools/_exp_devsw1.py > tools/logs/w35_devsw.log 2>&1
echo "[wave35] C rc=$?"
sleep 10

echo "[wave35] D: dev fwd trace (new defaults — residual glue list)"
timeout 1500 python tools/_trace_attrib.py dev \
  > tools/logs/w35_trdev.log 2>&1
echo "[wave35] D rc=$?"
sleep 10

echo "[wave35] E: ViT packed fwd attribution (non-attention ~16 ms)"
timeout 1500 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w35_trvit.log 2>&1
echo "[wave35] E rc=$?"
sleep 10

echo "[wave35] F: pretrain step attribution (dx/dw + BN glue)"
timeout 1800 python tools/_trace_attrib.py train \
  > tools/logs/w35_trtrain.log 2>&1
echo "[wave35] F rc=$?"
echo "[wave35] done"
