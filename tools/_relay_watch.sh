#!/bin/bash
# Wait for the axon relay (127.0.0.1:8103) to come back, then run ONE
# queue script. Keeps the one-TPU-client-at-a-time discipline: start at
# most one watcher, and nothing else may talk to the TPU while it runs.
set -u
script="${1:?queue script}"
while true; do
  # curl prints 000 itself on connect failure; the old `|| echo 000`
  # produced "000000", which passed the != "000" check and launched
  # wave-26/28 into a dead relay (the wave-26 A rc=124 root cause)
  code=$(curl -s -m 5 -o /dev/null -w '%{http_code}' http://127.0.0.1:8103/ || true)
  case "$code" in
  *000* | "")
    code_up=0
    ;;
  *)
    code_up=1
    ;;
  esac
  if [ "$code_up" = "1" ]; then
    echo "[watch] relay up ($code) at $(date -u)"
    sleep 30
    bash "$script"
    echo "[watch] queue done rc=$? at $(date -u)"
    exit 0
  fi
  echo "[watch] relay down at $(date -u)"
  sleep 120
done
