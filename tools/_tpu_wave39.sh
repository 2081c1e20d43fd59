#!/bin/bash
# Wave 39 (round 5): fixed Winograd spike, ViT re-measure with the wide
# tokenizer, then the full bench (BENCH_r05 preview).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave39] A: Winograd spike (quarter volume)"
timeout 2400 python tools/_exp_winograd.py > tools/logs/w39_wg.log 2>&1
echo "[wave39] A rc=$?"
sleep 10

echo "[wave39] B: ViT packed fwd attribution (wide tokenizer)"
timeout 1500 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w39_trvit.log 2>&1
echo "[wave39] B rc=$?"
sleep 10

echo "[wave39] C: ViT sliding 256"
timeout 1800 python tools/_bench_sw2.py vit > tools/logs/w39_vitsw.log 2>&1
echo "[wave39] C rc=$?"
sleep 10

echo "[wave39] D: full bench"
timeout 2400 python bench.py > tools/logs/w39_bench.out 2> tools/logs/w39_bench.err
echo "[wave39] D rc=$?"
echo "[wave39] done"
