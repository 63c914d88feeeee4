#!/bin/bash
# Round-5 supervisor: keep scripts/round5_queue.sh running across TPU-tunnel
# outages (same wait/relaunch pattern as round4_supervisor.sh). The queue is
# resumable (done-markers + committed mirror), so a relaunch only redoes the
# interrupted run.
cd /root/repo
[ -d /opt/venv/bin ] && export PATH="/opt/venv/bin:$PATH"
export PYTHONPATH=/root/repo:/root/.axon_site

wait_for_tunnel() {
  local cycle=0
  while true; do
    cycle=$((cycle + 1))
    if timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
      # require a REAL execution, not just device listing: during the
      # round-5 outage the control plane (jax.devices) stayed green for
      # ~50 min while every dispatch hung, and a devices-only probe
      # relaunched the queue into serial wedges
      if timeout 150 python -c "import jax, jax.numpy as jnp; print(float(jax.jit(lambda v: (v*v).sum())(jnp.arange(1024.0))))" >/dev/null 2>&1; then
        echo "$(date +%H:%M:%S) tunnel is up (exec probe)"
        return 0
      fi
    elif [ $((cycle % 5)) -eq 0 ]; then
      if timeout 150 python -c "import jax, jax.numpy as jnp; print(float(jax.jit(lambda v: (v*v).sum())(jnp.arange(1024.0))))" >/dev/null 2>&1; then
        echo "$(date +%H:%M:%S) tunnel is up (exec probe, no port 8083)"
        return 0
      fi
    fi
    sleep 60
  done
}

while true; do
  # a STOP file is an explicit operator pause: wait for it to clear instead
  # of deleting it (round-4 supervisor auto-removed STOP, which made
  # pausing for interactive TPU work impossible without killing the
  # supervisor)
  while [ -f runs/round2/STOP ]; do sleep 30; done
  wait_for_tunnel
  bash scripts/round5_queue.sh >> runs/round2/r5_queue.log 2>&1
  if tail -5 runs/round2/r5_queue.log | grep -q "round-5 queue done"; then
    echo "$(date +%H:%M:%S) queue complete, supervisor exiting"
    break
  fi
  echo "$(date +%H:%M:%S) queue exited early (rc=$?); waiting before relaunch"
  sleep 60
done
