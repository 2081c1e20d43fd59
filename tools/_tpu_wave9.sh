#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave9] job A: scatter crash probes (targeted)"
timeout 1800 python tools/_exp_scatterprobe.py > /tmp/q_sprobe2.log 2>&1
echo "[wave9] A rc=$?"
sleep 10
echo "[wave9] job B: vit fwd (restructured tokenizer)"
timeout 2400 python tools/_bench_vit.py > /tmp/q_vitfwd3.log 2>&1
echo "[wave9] B rc=$?"
sleep 5
echo "[wave9] job C: pretrain step (block entry conv)"
timeout 2400 python tools/_bench_train.py > /tmp/q_train4.log 2>&1
echo "[wave9] C rc=$?"
sleep 5
echo "[wave9] job D: isolated train kernels"
timeout 2400 python tools/_exp_trainkern.py > /tmp/q_trainkern.log 2>&1
echo "[wave9] D rc=$?"
echo "[wave9] done"
