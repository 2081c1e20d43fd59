#!/bin/bash
# Wave 27 (round 4): re-run the 192 probe that wave-26 A lost to the
# two-watcher overlap (it started 3 min after wave-25's last job and hung
# in backend init — the concurrent-client trap), trace the ViT fwd at the
# new flash blk=1408 default (wave-26 C1: sliding 7.64 s but fwd 26.0 ms,
# unexplained), and run the full -m tpu tier including the two new
# VERDICT-r3-#3 tests. Logs persist in tools/logs/.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
L=tools/logs
echo "[wave27] A: reg192 probe (extent guard, serialized this time)"
timeout 2400 python tools/_probe_reg192.py 192 > $L/w27_probe192.log 2>&1
echo "[wave27] A rc=$?"
sleep 20
echo "[wave27] B: ViT fwd attribution at FLASH_BLK=1408 (now default)"
timeout 2400 python tools/_trace_attrib.py vit > $L/w27_trvit1408.log 2>&1
echo "[wave27] B rc=$?"
sleep 20
echo "[wave27] C: full -m tpu tier (incl. max-pool VJP + BN fold HW tests)"
ANATOMIX_TPU_TESTS=1 timeout 3000 python -m pytest tests/ -m tpu -q \
  -p no:cacheprovider > $L/w27_tputests.log 2>&1
echo "[wave27] C rc=$?"
sleep 20
echo "[wave27] D: pad-fold adjoint experiment (dx glue)"
timeout 1200 python tools/_exp_padfold.py > $L/w27_padfold.log 2>&1
echo "[wave27] D rc=$?"
sleep 20
echo "[wave27] E: driver entry checks (entry + multichip dryrun)"
timeout 2400 python __graft_entry__.py > $L/w27_entry.log 2>&1
echo "[wave27] E rc=$?"
echo "[wave27] done"
