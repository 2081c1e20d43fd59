#!/bin/bash
# Wave 22: (A) dx backward attribution (trainkern showed dx ~4.4x fwd),
# (B) fresh train-step trace post round-3 fixes, (C) flash block-size
# sweep, (D) ViT fwd attribution after the cln-dtype + fold-exit work.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave22] A: dx attribution"
timeout 2400 python tools/_trace_attrib.py dx > /tmp/q_trdx.log 2>&1
echo "[wave22] A rc=$?"
sleep 30
echo "[wave22] B: train-step trace"
timeout 2400 python tools/_trace_attrib.py train > /tmp/q_trtrain2.log 2>&1
echo "[wave22] B rc=$?"
sleep 30
echo "[wave22] C: flash blk sweep"
timeout 2400 python tools/_exp_flashblk.py > /tmp/q_flashblk.log 2>&1
echo "[wave22] C rc=$?"
sleep 30
echo "[wave22] D: ViT fwd attribution"
timeout 2400 python tools/_trace_attrib.py vit > /tmp/q_trvit8.log 2>&1
echo "[wave22] D rc=$?"
sleep 30
echo "[wave22] E: ViT sliding attribution (sw_batch 2, fold+kernel)"
timeout 2400 python tools/_trace_vitsw.py > /tmp/q_trvitsw2.log 2>&1
echo "[wave22] E rc=$?"
echo "[wave22] done"
