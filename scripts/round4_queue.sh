#!/bin/bash
# Round-4 training queue (VERDICT round-3 tasks 1 and 3):
#
#  Phase 1 — refgrad TRAINING verdict: the shipped SOT_TPU_W2_MERGE=ref
#    backward (ops/pallas/refgrad.py) has on-chip gradient parity 0.0 vs
#    hybrid but zero full-training evidence (all round-3 sweep runs trained
#    hybrid). Train twin 25k runs (same seed/config, only the kernel gate
#    differs) for both the anneal recipe and the reference protocol, then
#    write results/round2/refgrad_train_verdict.json via
#    scripts/refgrad_train_verdict.py.
#
#  Phase 2 — SOT-512-LogF best-recipe tuning: column B is a seed lottery
#    (RPA 57.8(47.0)). Probe anneal-1500 vs anneal-3000 at seed 42, fill
#    the remaining seeds with the winner into runs/round2/best/.
#
#  Phase 3 — SOT-NoCut rescue: anneal is known-harmful here
#    (runs/tricks/nocut-anneal-42: 30.4 vs 64.2 unannealed). Probe
#    init-restarts (n_init_probes) and a 50k extension at seed 42, fill
#    seeds with the winner.
#
# Same conventions as paper_protocol_r2.sh: resumable done-markers,
# `touch runs/round2/STOP` pauses between tasks, finished metrics mirrored
# into git-tracked results/round2/runs/ and committed immediately.
set -u
cd /root/repo
[ -d /opt/venv/bin ] && export PATH="/opt/venv/bin:$PATH"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
mkdir -p runs/round2/r4 runs/round2/best results/round2/runs

stop_check() { [ -f runs/round2/STOP ] && { echo "STOP file present, exiting"; exit 0; }; }

run_done() {
  [ -f "runs/round2/$1/test_metrics_octcorr.json" ] && return 0
  [ -f "results/round2/runs/$1/test_metrics.json" ]
}

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
  git add -- "$dst" >/dev/null 2>&1 || true
  git commit -q -m "Persist best-lsd checkpoint: $1" -- "$dst" >/dev/null 2>&1 || true
}

# train_one <out-subdir> <experiment> <seed> [extra cli args...]
# Kernel gates come from the environment (phase 1 pins SOT_TPU_W2_MERGE
# per twin); when TRAIN_KERNELS=auto is exported, --kernels auto is added.
train_one() {
  local sub=$1 exp=$2 seed=$3; shift 3
  local out="runs/round2/$sub"
  local kflags=()
  [ "${TRAIN_KERNELS:-}" = auto ] && kflags=(--kernels auto)
  stop_check
  if run_done "$sub"; then echo "skip $sub"; return 0; fi
  echo "=== train $sub ($exp seed $seed) merge=${SOT_TPU_W2_MERGE:-unset} $(date +%H:%M:%S) ==="
  for attempt in 1 2; do
    timeout 3600 python -m sot_tpu.cli train --experiment "$exp" --seed "$seed" \
      "${kflags[@]}" --out "$out" --final-eval "$@" > "$out.train.log" 2>&1
    rc=$?
    if [ $rc -eq 0 ] && [ -f "$out/test_metrics_octcorr.json" ]; then
      persist_run "$sub"
      case "$sub" in *-42) persist_ckpt "$sub";; esac
      python3 - "$out" <<'EOF'
import json, sys
for v in ("", "_comb"):
    try:
        m = json.load(open(sys.argv[1] + f"/test_metrics{v}.json"))["test_metrics"]
        print(json.dumps({"run": sys.argv[1] + v,
                          "RPA": round(100*m["raw_pitch_accuracy"], 2),
                          "RCA": round(100*m["raw_chroma_accuracy"], 2),
                          "LSD": round(m["log_spectral_distance"], 2)}))
    except Exception as e:
        print(f"collect fail {v}: {e}")
EOF
      return 0
    fi
    echo "TRAIN FAIL $sub rc=$rc attempt=$attempt $(tail -2 "$out.train.log" | head -1)"
    sleep 20
  done
  return 1
}

# rpa <run-subdir> <variant>: print test RPA*100 (or -1 when missing)
rpa() {
  python3 - "$1" "$2" <<'EOF'
import json, sys
sub, var = sys.argv[1], sys.argv[2]
suffix = {"plain": "", "comb": "_comb", "octcorr": "_octcorr"}[var]
for root in ("runs/round2", "results/round2/runs"):
    try:
        m = json.load(open(f"{root}/{sub}/test_metrics{suffix}.json"))["test_metrics"]
        print(round(100 * m["raw_pitch_accuracy"], 3)); break
    except Exception:
        pass
else:
    print(-1)
EOF
}

# ---------- Phase 1: refgrad training verdict -------------------------------
# Twins differ ONLY in the merge-mode env pin (explicit export/unset: a
# `VAR=x func` prefix before a bash FUNCTION leaks past the call in POSIX
# mode). The round-3 hybrid sweep run best/SOT-2048-42 (RPA 99.51) is a
# third comparator for the anneal recipe.
merge_train() { # <mode> <args for train_one...>
  local mode=$1; shift
  export SOT_TPU_W2_MERGE="$mode"
  train_one "$@"
  local rc=$?
  unset SOT_TPU_W2_MERGE
  return $rc
}
merge_train ref    r4/refverd-ref-anneal-42 SOT-2048-Anneal 42
merge_train hybrid r4/refverd-hyb-anneal-42 SOT-2048-Anneal 42
merge_train ref    r4/refverd-ref-plain-42  SOT-2048 42
merge_train hybrid r4/refverd-hyb-plain-42  SOT-2048 42
# commit the verdict whatever it says (a negative result gates the kernel
# back to hybrid via kernel_gates and must be preserved)
python scripts/refgrad_train_verdict.py; vrc=$?
if [ -f results/round2/refgrad_train_verdict.json ] && [ $vrc -ne 1 ]; then
  git add results/round2/refgrad_train_verdict.json
  git commit -q -m "refgrad training verdict: 25k twin runs, ref vs hybrid merge backward" \
    -- results/round2/refgrad_train_verdict.json || true
fi

# ---------- Phase 2: SOT-512-LogF best-recipe tuning ------------------------
A1500='temperature_schedule=[1.0,0.1,1500]'
A3000='temperature_schedule=[1.0,0.1,3000]'
export TRAIN_KERNELS=auto
train_one r4/logf-a1500-42 SOT-512-LogF 42 --set "$A1500"
train_one r4/logf-a3000-42 SOT-512-LogF 42 --set "$A3000"
R1500=$(rpa r4/logf-a1500-42 comb); R3000=$(rpa r4/logf-a3000-42 comb)
echo "LogF seed-42 probe: a1500=$R1500 a3000=$R3000"
LOGF_SCHED="$A1500"
if python3 -c "import sys; sys.exit(0 if float('$R3000') > float('$R1500') else 1)"; then
  LOGF_SCHED="$A3000"
fi
echo "LogF winner: $LOGF_SCHED"
# seed 42 column-B slot reuses the winning probe run's metrics
WIN42=r4/logf-a1500-42
[ "$LOGF_SCHED" = "$A3000" ] && WIN42=r4/logf-a3000-42
mkdir -p runs/round2/best/SOT-512-LogF-42
cp -f "runs/round2/$WIN42"/test_metrics*.json runs/round2/best/SOT-512-LogF-42/ 2>/dev/null || \
  cp -f "results/round2/runs/$WIN42"/test_metrics*.json runs/round2/best/SOT-512-LogF-42/ || true
persist_run best/SOT-512-LogF-42
for seed in 123 456 789 101112; do
  train_one "best/SOT-512-LogF-$seed" SOT-512-LogF "$seed" --set "$LOGF_SCHED"
done

# ---------- Phase 3: SOT-NoCut rescue ---------------------------------------
PROBES='n_init_probes=8'
PSTEPS='probe_steps=1000'
train_one r4/nocut-probes-42 SOT-NoCut 42 --set "$PROBES" --set "$PSTEPS"
train_one r4/nocut-50k-42    SOT-NoCut 42 --steps 50000
RPROBE=$(rpa r4/nocut-probes-42 comb); R50K=$(rpa r4/nocut-50k-42 comb)
echo "NoCut seed-42 probe: probes=$RPROBE 50k=$R50K"
NOCUT_ARGS=(--set "$PROBES" --set "$PSTEPS")
WIN42=r4/nocut-probes-42
if python3 -c "import sys; sys.exit(0 if float('$R50K') > float('$RPROBE') else 1)"; then
  NOCUT_ARGS=(--steps 50000); WIN42=r4/nocut-50k-42
fi
echo "NoCut winner: ${NOCUT_ARGS[*]}"
mkdir -p runs/round2/best/SOT-NoCut-42
cp -f "runs/round2/$WIN42"/test_metrics*.json runs/round2/best/SOT-NoCut-42/ 2>/dev/null || \
  cp -f "results/round2/runs/$WIN42"/test_metrics*.json runs/round2/best/SOT-NoCut-42/ || true
persist_run best/SOT-NoCut-42
for seed in 123 456 789 101112; do
  train_one "best/SOT-NoCut-$seed" SOT-NoCut "$seed" "${NOCUT_ARGS[@]}"
done

python scripts/collect_round2.py || true
echo "=== round-4 queue done $(date +%H:%M:%S) ==="
