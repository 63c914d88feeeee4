#!/bin/bash
# Collapse-rate addendum (round-3, VERDICT item 5): 10 extra
# reference-protocol SOT-2048 seeds under runs/round2/refextra/ (the
# collector folds them into sot2048_collapse.json without touching the
# 5-seed paper table), plus a fresh ref/SOT-2048-42 purely to restore the
# wiped seed-42 reference-protocol checkpoint (the collector sources
# SOT-2048 column A from the committed round-1 per-run JSON, so this run
# never enters the table either).
# Resumable: done-marker is test_metrics_octcorr.json; `touch
# runs/round2/STOP` halts between tasks. Prints "collapse-rate addendum
# done" ONLY when every marker exists.
set -u
cd /root/repo
[ -d /opt/venv/bin ] && export PATH="/opt/venv/bin:$PATH"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
mkdir -p runs/round2/refextra results/round2/runs

stop_check() { [ -f runs/round2/STOP ] && { echo "STOP file present, exiting"; exit 0; }; }

persist_run() {
  local out="runs/round2/$1" dst="results/round2/runs/$1"
  mkdir -p "$dst"
  cp -f "$out"/test_metrics*.json "$dst"/ 2>/dev/null || true
  git add -- "$dst" >/dev/null 2>&1 || true
  git commit -q -m "Mirror run metrics: $1" -- "$dst" >/dev/null 2>&1 || true
}

persist_ckpt() {
  local src="runs/round2/$1/checkpoints/best-lsd" dst="results/checkpoints/$1"
  [ -d "$src" ] || return 0
  mkdir -p "$(dirname "$dst")"
  rm -rf "$dst" && cp -r "$src" "$dst"
}

train_one() {
  local sub=$1 exp=$2 seed=$3; shift 3
  local out="runs/round2/$sub"
  stop_check
  if [ -f "$out/test_metrics_octcorr.json" ]; then echo "skip $sub"; return 0; fi
  echo "=== train $sub ($exp seed $seed) $(date +%H:%M:%S) ==="
  for attempt in 1 2; do
    timeout 2700 python -m sot_tpu.cli train --experiment "$exp" --seed "$seed" \
      --kernels auto --out "$out" --final-eval "$@" > "$out.train.log" 2>&1
    rc=$?
    if [ $rc -eq 0 ] && [ -f "$out/test_metrics_octcorr.json" ]; then
      persist_run "$sub"
      case "$sub" in *-42) persist_ckpt "$sub";; esac
      python3 - "$out" <<'EOF'
import json, sys
try:
    m = json.load(open(sys.argv[1] + "/test_metrics.json"))["test_metrics"]
    print(json.dumps({"run": sys.argv[1],
                      "RPA": round(100*m["raw_pitch_accuracy"], 2),
                      "RCA": round(100*m["raw_chroma_accuracy"], 2),
                      "LSD": round(m["log_spectral_distance"], 2)}))
except Exception as e:
    print(f"collect fail: {e}")
EOF
      return 0
    fi
    echo "TRAIN FAIL $sub rc=$rc attempt=$attempt $(tail -2 "$out.train.log" | head -1)"
    sleep 20
  done
  return 1
}

EXTRA_SEEDS=(7 13 99 271 555 777 1234 2024 31337 424242)
TASKS=()
for s in "${EXTRA_SEEDS[@]}"; do
  train_one "refextra/SOT-2048-$s" SOT-2048 "$s"
  TASKS+=("refextra/SOT-2048-$s")
done
train_one "ref/SOT-2048-42" SOT-2048 42
TASKS+=("ref/SOT-2048-42")

python scripts/collect_round2.py || true

missing=0
for t in "${TASKS[@]}"; do
  [ -f "runs/round2/$t/test_metrics_octcorr.json" ] || { echo "still missing $t"; missing=1; }
done
if [ "$missing" -eq 0 ]; then
  echo "=== collapse-rate addendum done $(date +%H:%M:%S) ==="
fi
