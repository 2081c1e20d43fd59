#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave46] A: dev fwd trace (bf16 IN apply)"
timeout 1500 python tools/_trace_attrib.py dev \
  > tools/logs/w46_trdev.log 2>&1
echo "[wave46] A rc=$?"
sleep 10

echo "[wave46] B: ViT packed fwd trace (bf16 IN apply)"
timeout 1500 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w46_trvit.log 2>&1
echo "[wave46] B rc=$?"
sleep 10

echo "[wave46] C: dev sliding"
timeout 1800 python tools/_exp_devsw1.py > tools/logs/w46_devsw.log 2>&1
echo "[wave46] C rc=$?"
sleep 10

echo "[wave46] D: dev HW-tier numerics test (default paths changed)"
ANATOMIX_TPU_TESTS=1 timeout 1800 python -m pytest \
  tests/test_tpu_numerics.py -m tpu -q \
  -k "dev_fused or instance or trilinear" \
  > tools/logs/w46_tier.log 2>&1
echo "[wave46] D rc=$?"
sleep 10

echo "[wave46] E: ViT sliding (bf16 IN in tokenizer)"
timeout 1800 python tools/_bench_sw2.py vit > tools/logs/w46_vitsw.log 2>&1
echo "[wave46] E rc=$?"
echo "[wave46] done"
