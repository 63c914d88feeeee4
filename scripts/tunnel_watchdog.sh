#!/bin/bash
# Wait for the axon tunnel to return, then resume the paper-protocol sweep.
cd /root/repo
while true; do
  if timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    echo "$(date +%H:%M:%S) port 8083 open, verifying with jax probe"
    if timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
      echo "$(date +%H:%M:%S) tunnel is back"
      break
    fi
    echo "$(date +%H:%M:%S) probe failed despite open port; retrying"
  fi
  sleep 60
done
rm -f runs/round2/STOP
nohup bash scripts/paper_protocol_r2.sh >> runs/round2/driver.log 2>&1 &
echo "sweep relaunched (pid $!)"
