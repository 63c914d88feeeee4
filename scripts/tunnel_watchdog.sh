#!/bin/bash
# Supervise the paper-protocol sweep across TPU-tunnel outages.
# Outer loop: wait for the tunnel -> (re)launch the resumable queue ->
# wait for it to exit -> if the queue finished its last phase, stop;
# otherwise (tunnel died again / crash) go back to waiting.
# Probes port 8083 every 60 s (fast path); every 5th cycle also runs a
# full jax probe regardless of port state, in case the tunnel returns on
# a different port than before the outage.
cd /root/repo
# Pin the ML venv: the container's default PATH may lack jax entirely.
[ -d /opt/venv/bin ] && export PATH="/opt/venv/bin:$PATH"

wait_for_tunnel() {
  local cycle=0
  while true; do
    cycle=$((cycle + 1))
    if timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
      echo "$(date +%H:%M:%S) port 8083 open, verifying with jax probe"
      if timeout 150 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
        echo "$(date +%H:%M:%S) tunnel is back"
        return 0
      fi
      echo "$(date +%H:%M:%S) probe failed despite open port; retrying"
    elif [ $((cycle % 5)) -eq 0 ]; then
      echo "$(date +%H:%M:%S) port closed; periodic direct jax probe"
      if timeout 150 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
        echo "$(date +%H:%M:%S) tunnel is back (no port 8083)"
        return 0
      fi
    fi
    sleep 60
  done
}

while true; do
  wait_for_tunnel
  rm -f runs/round2/STOP
  bash scripts/paper_protocol_r2.sh >> runs/round2/driver.log 2>&1
  rc=$?
  if tail -5 runs/round2/driver.log | grep -q "collapse-rate addendum done"; then
    echo "$(date +%H:%M:%S) queue fully done (rc=$rc), watchdog exiting"
    break
  fi
  if [ -f runs/round2/STOP ]; then
    echo "$(date +%H:%M:%S) STOP file present, watchdog exiting"
    break
  fi
  echo "$(date +%H:%M:%S) queue exited early (rc=$rc), waiting for tunnel again"
  sleep 60
done
