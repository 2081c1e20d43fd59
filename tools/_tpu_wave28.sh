#!/bin/bash
# Wave 28 (round 4): validate the pool revert + BN custom VJP on the real
# step, re-run the fixed BN A/B (first run hit the 413 payload limit),
# probe the d2s interleave-exit reshape on Mosaic, re-run the two -m tpu
# tests touched since wave 27, then a FULL bench.py (validates BENCH_r04
# readiness and warms the persistent compile cache for the driver run).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
L=tools/logs
echo "[wave28] A: d2s interleave-exit Mosaic probe"
timeout 1200 python tools/_probe_d2s_interleave.py > $L/w28_d2sprobe.log 2>&1
echo "[wave28] A rc=$?"
sleep 20
echo "[wave28] B: pool/BN A/B (fixed: target rides as jit arg)"
timeout 1800 python tools/_exp_bnpool.py > $L/w28_bnpool.log 2>&1
echo "[wave28] B rc=$?"
sleep 20
echo "[wave28] C: train step bench + trace (pool revert + BN VJP landed)"
{ timeout 1800 python tools/_bench_train.py && \
  timeout 2400 python tools/_trace_attrib.py train; } \
  > $L/w28_train.log 2>&1
echo "[wave28] C rc=$?"
sleep 20
echo "[wave28] D: re-run the two touched -m tpu tests"
ANATOMIX_TPU_TESTS=1 timeout 1800 python -m pytest \
  tests/test_tpu_numerics.py::test_max_pool2x_vjp_matches_xla_hw \
  tests/test_tpu_numerics.py::test_batch_norm_train_bf16_fold_hw \
  tests/test_tpu_numerics.py::test_d2s_interleave_matches_plain_hw \
  tests/test_tpu_numerics.py::test_s2d_c1_matches_xla_hw \
  tests/test_tpu_numerics.py::test_vit_stem_pallas_matches_xla_hw \
  -m tpu -q -p no:cacheprovider > $L/w28_tputests.log 2>&1
echo "[wave28] D rc=$?"
if grep -E "^(v1 interleave reshape|depth_to_space_interleave): FAIL" \
    $L/w28_d2sprobe.log; then
  echo "[wave28] interleave probe FAILED - bench runs with fallback"
  export ANATOMIX_D2S_INTERLEAVE=0
fi
if grep -E "^space_to_depth_c1: FAIL" $L/w28_d2sprobe.log; then
  echo "[wave28] s2d_c1 probe FAILED - bench runs with XLA entry"
  export ANATOMIX_S2D_C1=0
fi
sleep 20
echo "[wave28] D2: ViT fwd + sliding with the s2d_c1 entry + interleave exit"
{ timeout 1200 python tools/_bench_vit.py && \
  timeout 2400 python tools/_bench_sw2.py vit; } > $L/w28_vitsw.log 2>&1
echo "[wave28] D2 rc=$?"
sleep 20
echo "[wave28] E: FULL bench.py (budget 1500 s)"
timeout 1700 python bench.py > $L/w28_bench.log 2>&1
echo "[wave28] E rc=$?"
echo "[wave28] done"
