#!/bin/bash
# Wait for the axon tunnel to return, then resume the paper-protocol sweep.
# Probes port 8083 every 60 s (fast path); every 5th cycle it also runs a
# full jax probe regardless of port state, in case the tunnel returns on a
# different port than before the outage.
cd /root/repo
cycle=0
while true; do
  cycle=$((cycle + 1))
  if timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    echo "$(date +%H:%M:%S) port 8083 open, verifying with jax probe"
    if timeout 150 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
      echo "$(date +%H:%M:%S) tunnel is back"
      break
    fi
    echo "$(date +%H:%M:%S) probe failed despite open port; retrying"
  elif [ $((cycle % 5)) -eq 0 ]; then
    echo "$(date +%H:%M:%S) port closed; periodic direct jax probe"
    if timeout 150 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
      echo "$(date +%H:%M:%S) tunnel is back (no port 8083)"
      break
    fi
  fi
  sleep 60
done
rm -f runs/round2/STOP
nohup bash scripts/paper_protocol_r2.sh >> runs/round2/driver.log 2>&1 &
echo "$(date +%H:%M:%S) sweep relaunched (pid $!)"
