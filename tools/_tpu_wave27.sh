#!/bin/bash
# Wave 27 (round 4): validate the extent guard at 192 (wave-26 A lost it
# to the two-watcher overlap), measure the new 4-D packed-window entry on
# the real sliding workloads, trace the ViT fwd at the flash blk=1408
# default, run the full -m tpu tier, and A/B the train-step glue suspects
# (pad-fold adjoint, pool VJP, BN backward). Logs persist in tools/logs/.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
L=tools/logs
echo "[wave27] A: reg192 probe (extent guard, serialized this time)"
timeout 2400 python tools/_probe_reg192.py 192 > $L/w27_probe192.log 2>&1
echo "[wave27] A rc=$?"
sleep 20
echo "[wave27] B1: 6M sliding 256 (4-D packed windows)"
timeout 1800 python tools/_bench_sw2.py unet > $L/w27_sw6m.log 2>&1
echo "[wave27] B1 rc=$?"
sleep 20
echo "[wave27] B2: ViT fwd + sliding 256 (4-D packed windows + blk 1408)"
{ timeout 1200 python tools/_bench_vit.py && \
  timeout 2400 python tools/_bench_sw2.py vit; } > $L/w27_vitsw.log 2>&1
echo "[wave27] B2 rc=$?"
sleep 20
echo "[wave27] C: ViT fwd attribution at the 1408 default"
timeout 2400 python tools/_trace_attrib.py vit > $L/w27_trvit1408.log 2>&1
echo "[wave27] C rc=$?"
sleep 20
echo "[wave27] D: full -m tpu tier (incl. max-pool VJP + BN fold HW tests)"
ANATOMIX_TPU_TESTS=1 timeout 3000 python -m pytest tests/ -m tpu -q \
  -p no:cacheprovider > $L/w27_tputests.log 2>&1
echo "[wave27] D rc=$?"
sleep 20
echo "[wave27] E: pad-fold adjoint experiment (dx glue)"
timeout 1200 python tools/_exp_padfold.py > $L/w27_padfold.log 2>&1
echo "[wave27] E rc=$?"
sleep 20
echo "[wave27] F: pool-VJP + BN-backward A/B (train glue)"
timeout 1800 python tools/_exp_bnpool.py > $L/w27_bnpool.log 2>&1
echo "[wave27] F rc=$?"
sleep 20
echo "[wave27] G: driver entry checks (entry + multichip dryrun)"
timeout 2400 python __graft_entry__.py > $L/w27_entry.log 2>&1
echo "[wave27] G rc=$?"
echo "[wave27] done"
