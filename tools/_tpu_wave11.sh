#!/bin/bash
# Wave 11: validate the blend-scatter kernel on HW (wave-10's crash was a
# probe OOB bug, fixed in 463d5a1), then parity + timing + 6M sliding.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave11] job A: fixed full-kernel scatter probe"
timeout 1200 python tools/_exp_scatterprobe.py probe_full_kernel_small > /tmp/q_sprobe4.log 2>&1
echo "[wave11] A rc=$?"
sleep 10
echo "[wave11] job B: scatter kernel parity + timing + 6M sliding"
timeout 2400 python tools/_exp_scatter3.py > /tmp/q_scatter5.log 2>&1
echo "[wave11] B rc=$?"
echo "[wave11] done"
