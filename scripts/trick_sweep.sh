#!/bin/bash
# Local-minima-escape sweep: SOT-2048 failed seeds with optimisation tricks.
# Results land in runs/tricks/<name>/ (best_metrics.json = val at best-LSD)
# plus a test-split eval JSON per run.
set -u
cd /root/repo
mkdir -p runs/tricks

run_one() {
  name=$1; seed=$2; shift 2
  out="runs/tricks/$name"
  if [ -f "$out/test_metrics.json" ]; then echo "skip $name"; return; fi
  echo "=== $name (seed $seed) $(date +%H:%M:%S) ==="
  timeout 1800 python -m sot_tpu.cli train --experiment SOT-2048 \
    --seed "$seed" --out "$out" "$@" > "$out.train.log" 2>&1
  timeout 600 python -m sot_tpu.cli evaluate --split test \
    --ckpt "$out/checkpoints/best-lsd" > "$out/test_metrics.json" 2> "$out.eval.log"
  python - "$out" <<'EOF'
import json, sys
m = json.load(open(sys.argv[1] + "/test_metrics.json"))["test_metrics"]
print(json.dumps({"run": sys.argv[1],
                  "RPA": round(100*m["raw_pitch_accuracy"], 2),
                  "RCA": round(100*m["raw_chroma_accuracy"], 2),
                  "LSD": round(m["log_spectral_distance"], 2),
                  "OD": round(-m["octave_difference"], 3)}))
EOF
}

ANNEAL=(--set 'temperature_schedule=[1.0,0.1,3000]')
PROBES=(--set n_init_probes=4 --set probe_steps=1500)

run_one anneal-101112 101112 "${ANNEAL[@]}"
run_one anneal-789    789    "${ANNEAL[@]}"
run_one probes-101112 101112 "${PROBES[@]}"
run_one probes-789    789    "${PROBES[@]}"
run_one anneal-42     42     "${ANNEAL[@]}"
run_one probes-42     42     "${PROBES[@]}"
echo "=== sweep done $(date +%H:%M:%S) ==="
