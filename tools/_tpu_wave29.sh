#!/bin/bash
# Wave 29 (round 4): validate the factor-8 PACKED decoder exit + block-space
# ViT decoder on HW, confirm the train step at HEAD, green the tpu tier, and
# produce the full bench record with the fixed ViT section.
# Results land in tools/logs/ (NOT /tmp) so an outage can't drop evidence.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave29] A: d2s8 packed probe (compile + parity + timing)"
timeout 1200 python -c "
import importlib.util
spec = importlib.util.spec_from_file_location(
    'probe', 'tools/_probe_d2s_interleave.py')
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
m.probe_d2s8()
" > tools/logs/w29_d2s8.log 2>&1
echo "[wave29] A rc=$?"
sleep 10

echo "[wave29] B: ViT fwd A/B (packed/spatial x block gate) + parity"
timeout 2400 python tools/_bench_vit_packed.py > tools/logs/w29_vitab.log 2>&1
echo "[wave29] B rc=$?"
sleep 10

echo "[wave29] C: tpu test tier (block-space decoder ON to cover d2s8)"
ANATOMIX_TPU_TESTS=1 ANATOMIX_DECODER_BLOCK=1 timeout 2400 \
  python -m pytest tests/ -m tpu -q > tools/logs/w29_tputests.log 2>&1
echo "[wave29] C rc=$?"
sleep 10

echo "[wave29] D: train step at HEAD (expect ~249 ms)"
timeout 1800 python tools/_bench_train.py > tools/logs/w29_train.log 2>&1
echo "[wave29] D rc=$?"
sleep 10

echo "[wave29] E: FULL bench.py (new section order, budget 1600)"
timeout 1800 python bench.py > tools/logs/w29_bench.log 2>&1
echo "[wave29] E rc=$?"
echo "[wave29] done"
