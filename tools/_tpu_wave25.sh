#!/bin/bash
# Wave 25 (round 4): logs persist in tools/logs/ (repo, not /tmp —
# VERDICT r3 #8).
# A) 192-chain Mosaic compile probe (registration failure, VERDICT #2)
# B) dx backward attribution (VERDICT #5)
# C) trainkern per-conv shootout (post out_w-align fix)
# D) flash blk sweep (ViT fwd target, VERDICT #4)
# E) ViT fwd attribution
# F) ViT sliding attribution (sw_batch 2)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
L=tools/logs
echo "[wave25] A: reg192 probe"
timeout 2400 python tools/_probe_reg192.py 192 > $L/w25_probe192.log 2>&1
echo "[wave25] A rc=$?"
sleep 20
echo "[wave25] B: dx attribution"
timeout 2400 python tools/_trace_attrib.py dx > $L/w25_trdx.log 2>&1
echo "[wave25] B rc=$?"
sleep 20
echo "[wave25] C: trainkern"
timeout 2400 python tools/_exp_trainkern.py > $L/w25_trainkern.log 2>&1
echo "[wave25] C rc=$?"
sleep 20
echo "[wave25] D: flash blk sweep"
timeout 2400 python tools/_exp_flashblk.py > $L/w25_flashblk.log 2>&1
echo "[wave25] D rc=$?"
sleep 20
echo "[wave25] E: ViT fwd attribution"
timeout 2400 python tools/_trace_attrib.py vit > $L/w25_trvit.log 2>&1
echo "[wave25] E rc=$?"
sleep 20
echo "[wave25] F: ViT sliding attribution"
timeout 2400 python tools/_trace_vitsw.py > $L/w25_trvitsw.log 2>&1
echo "[wave25] F rc=$?"
echo "[wave25] done"
