#!/bin/bash
# Round-3 follow-on supervisor. The round-2 watchdog
# (scripts/tunnel_watchdog.sh) relaunches the paper-protocol queue forever:
# its exit condition greps driver.log for "collapse-rate addendum done",
# which the queue never prints. This script (1) waits for every main-queue
# done-marker, (2) retires the watchdog through its own STOP-file exit path
# (no process killing), then (3) runs scripts/collapse_addendum.sh under the
# same tunnel-outage supervision until ITS done line lands.
set -u
cd /root/repo
[ -d /opt/venv/bin ] && export PATH="/opt/venv/bin:$PATH"

log() { echo "$(date +%H:%M:%S) $*"; }

SEEDS=(42 123 456 789 101112)
MAIN=()
for s in "${SEEDS[@]}"; do
  MAIN+=("best/SOT-2048-$s" "ref/SOT-512-LogF-$s" "ref/SOT-512-$s"
         "ref/SOT-NoCut-$s" "ref/SOT-2048-SS-$s" "best/SOT-512-$s"
         "best/SOT-2048-SS-$s" "ref/MSS-Lin-$s" "ref/MSS-LogLin-$s")
done

# Same completion rule as paper_protocol_r2.sh:run_done — the live octcorr
# marker OR the git-committed mirror's table-variant file (wipe resilience).
run_done() {
  [ -f "runs/round2/$1/test_metrics_octcorr.json" ] && return 0
  case "$1" in
    ref/*|refextra/*) [ -f "results/round2/runs/$1/test_metrics.json" ] ;;
    *)                [ -f "results/round2/runs/$1/test_metrics_comb.json" ] ;;
  esac
}

main_missing() {
  local n=0 t
  for t in "${MAIN[@]}"; do
    run_done "$t" || { n=$((n + 1)); echo "  owed: $t"; }
  done
  return $n
}

# --- phase 1: wait for the main queue to fully drain (marker count, not
# log lines: the queue reaches its final echo even when a task failed) ---
i=0
while true; do
  owed=$(main_missing | wc -l)
  [ "$owed" -eq 0 ] && break
  i=$((i + 1))
  [ $((i % 15)) -eq 1 ] && { log "main queue still owes $owed runs"; main_missing || true; }
  sleep 120
done
log "main queue fully drained (45/45 markers)"

# --- phase 2: retire the watchdog. Its only exit checks run right after a
# queue pass exits; the queue itself exits at its first stop_check when STOP
# is present. Hold STOP until the watchdog process is gone (pgrep used for
# DETECTION only). ---
while pgrep -f scripts/tunnel_watchdog.sh > /dev/null 2>&1; do
  touch runs/round2/STOP
  sleep 2
done
log "watchdog retired"
# let any still-running queue pass notice STOP and exit before we take the TPU
while pgrep -f scripts/paper_protocol_r2.sh > /dev/null 2>&1; do sleep 5; done
rm -f runs/round2/STOP
log "queue fully stopped; starting collapse addendum"

# --- phase 3: collapse addendum under tunnel-outage supervision ---
wait_for_tunnel() {
  while true; do
    if timeout 150 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
      log "tunnel ok"; return 0
    fi
    log "tunnel down; retry in 60s"
    sleep 60
  done
}

while true; do
  wait_for_tunnel
  bash scripts/collapse_addendum.sh >> runs/round2/driver.log 2>&1
  if tail -5 runs/round2/driver.log | grep -q "collapse-rate addendum done"; then
    log "addendum done, supervisor exiting"
    break
  fi
  if [ -f runs/round2/STOP ]; then
    log "STOP present, supervisor exiting"
    break
  fi
  log "addendum pass incomplete, waiting for tunnel again"
  sleep 60
done
