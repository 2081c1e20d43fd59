#!/bin/bash
# Wave 20: (A) sliding bench kernel ON + fold exits (6M + ViT),
# (B) 6M sliding attribution kernel ON, (C) dev 94M sliding + fidelity
# kernel ON, (D) full -m tpu tier (now incl. scatter HW tests).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave20] A: sliding bench, scatter kernel ON"
ANATOMIX_SCATTER_KERNEL=1 timeout 3000 python tools/_bench_sw2.py > /tmp/q_sw9.log 2>&1
echo "[wave20] A rc=$?"
sleep 30
echo "[wave20] B: 6M sliding attribution, kernel ON"
ANATOMIX_SCATTER_KERNEL=1 timeout 2400 python tools/_trace_attrib.py sw > /tmp/q_trsw3.log 2>&1
echo "[wave20] B rc=$?"
sleep 30
echo "[wave20] C: dev 94M sliding + full_tiled fidelity, kernel ON"
ANATOMIX_SCATTER_KERNEL=1 timeout 3000 python tools/_bench_devfid.py > /tmp/q_devfid.log 2>&1
echo "[wave20] C rc=$?"
sleep 30
echo "[wave20] D: full -m tpu tier"
ANATOMIX_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_numerics.py -q -m tpu > /tmp/q_tputests5.log 2>&1
echo "[wave20] D rc=$?"
echo "[wave20] done"
