#!/bin/bash
# Round-2/3 paper protocol: 5 seeds x 7 families, reference protocol (column
# A, runs/round2/ref) + best-known per-family recipe (column B,
# runs/round2/best).
#
# Wipe-resilience (round-2 postmortem: the container reset deleted gitignored
# runs/, orphaning every evalonly/--resume step):
#   - checkpoint-reuse steps fall back to training from scratch when the
#     source checkpoint is gone (evalonly_or_train);
#   - each finished run's test_metrics*.json is mirrored into git-tracked
#     results/round2/runs/<sub>/ (persist_run), so the paper table is
#     re-derivable from the repo alone;
#   - seed-42 best-lsd checkpoints are copied into results/checkpoints/
#     (persist_ckpt) so `cli evaluate --ckpt` works on a fresh clone.
# Resumable: completed runs are skipped; `touch runs/round2/STOP` halts the
# queue between tasks. Prelude A/Bs are gated on a `"complete": true` flag
# inside the JSON, not file existence (a timeout mid-variant used to
# permanently satisfy the marker).
set -u
cd /root/repo
# The container's default PATH may not include the ML venv (round-3 finding:
# /usr/local/bin/python has no jax/numpy); pin it explicitly.
[ -d /opt/venv/bin ] && export PATH="/opt/venv/bin:$PATH"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
mkdir -p runs/round2/ref runs/round2/best results/round2/runs

stop_check() { [ -f runs/round2/STOP ] && { echo "STOP file present, exiting"; exit 0; }; }

# run_done <sub>: a run counts as complete when its live octcorr marker
# exists OR the git-committed mirror holds the variant the paper table
# actually reads (plain for column-A ref runs, comb for column-B). The
# mirror check makes the queue itself wipe-resilient: after a container
# reset, scripts/restore_run_mirror.py rebuilds the mirror from the
# committed aggregate and the queue skips the ~29 already-finished runs.
run_done() {
  [ -f "runs/round2/$1/test_metrics_octcorr.json" ] && return 0
  case "$1" in
    ref/*|refextra/*) [ -f "results/round2/runs/$1/test_metrics.json" ] ;;
    *)                [ -f "results/round2/runs/$1/test_metrics_comb.json" ] ;;
  esac
}

# ab_done <json>: success iff the artifact exists AND carries the
# completeness flag written after the LAST variant.
ab_done() {
  python3 - "$1" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception:
    raise SystemExit(1)
raise SystemExit(0 if d.get("complete") else 1)
EOF
}

# persist_run <sub>: mirror a finished run's metrics into git-tracked
# results/ AND commit them immediately (round-3 postmortem: the mirror was
# written but never committed, so the next container reset lost it anyway).
# Pathspec-scoped commit so it can never sweep up unrelated staged work; a
# lock collision with an interactive commit just defers to the next pass.
persist_run() {
  local out="runs/round2/$1" dst="results/round2/runs/$1"
  mkdir -p "$dst"
  cp -f "$out"/test_metrics*.json "$dst"/ 2>/dev/null || true
  [ -f "$out/source_ckpt.txt" ] && cp -f "$out/source_ckpt.txt" "$dst/" || true
  git add -- "$dst" >/dev/null 2>&1 || true
  git commit -q -m "Mirror run metrics: $1" -- "$dst" >/dev/null 2>&1 || true
}

# persist_ckpt <sub>: keep the best-lsd checkpoint of table-headline runs
# (seed 42 of every family/column; ~50K-param encoder, a few MB total)
persist_ckpt() {
  local src="runs/round2/$1/checkpoints/best-lsd" dst="results/checkpoints/$1"
  [ -d "$src" ] || return 0
  mkdir -p "$(dirname "$dst")"
  rm -rf "$dst" && cp -r "$src" "$dst"
  git add -- "$dst" >/dev/null 2>&1 || true
  git commit -q -m "Persist best-lsd checkpoint: $1" -- "$dst" >/dev/null 2>&1 || true
}

# train_one <out-subdir> <experiment> <seed> [extra cli args...]
train_one() {
  local sub=$1 exp=$2 seed=$3; shift 3
  local out="runs/round2/$sub"
  stop_check
  if run_done "$sub"; then echo "skip $sub"; return 0; fi
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
for v in ("", "_octcorr"):
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

# evalonly <out-subdir> <ckpt-dir>  (reuse a round-1 checkpoint: both evals)
evalonly() {
  local sub=$1 ckpt=$2
  local out="runs/round2/$sub"
  stop_check
  if run_done "$sub"; then echo "skip $sub"; return 0; fi
  if [ ! -d "$ckpt" ]; then echo "MISSING CKPT $ckpt"; return 1; fi
  echo "=== evalonly $sub <- $ckpt $(date +%H:%M:%S) ==="
  mkdir -p "$out"
  echo "$ckpt" > "$out/source_ckpt.txt"
  timeout 900 python -m sot_tpu.cli evaluate --split test --ckpt "$ckpt" \
    > "$out/test_metrics.json" 2> "$out.eval.log" || { echo "EVAL FAIL $sub"; return 1; }
  timeout 900 python -m sot_tpu.cli evaluate --split test --ckpt "$ckpt" \
    --set eval_octave_correction=true \
    > "$out/test_metrics_octcorr.json" 2>> "$out.eval.log" || { echo "EVAL FAIL $sub (octcorr)"; return 1; }
  timeout 900 python -m sot_tpu.cli evaluate --split test --ckpt "$ckpt" \
    --set eval_comb_correction=true \
    > "$out/test_metrics_comb.json" 2>> "$out.eval.log" || { echo "EVAL FAIL $sub (comb)"; return 1; }
  persist_run "$sub"
}

# evalonly_or_train <sub> <ckpt> <exp> <seed> [extra args...]: reuse the
# checkpoint when it survives, otherwise train from scratch (round-2
# postmortem: a wipe of runs/ orphaned every reuse step with no fallback).
evalonly_or_train() {
  local sub=$1 ckpt=$2 exp=$3 seed=$4; shift 4
  if [ -d "$ckpt" ]; then
    evalonly "$sub" "$ckpt"
  else
    echo "ckpt $ckpt gone; retraining $sub from scratch"
    train_one "$sub" "$exp" "$seed" "$@"
  fi
}

# comb_backfill <out-subdir>: add the comb-corrected test eval to a run that
# completed before the comb correction existed (in-run checkpoints, or the
# source checkpoint an evalonly run recorded)
comb_backfill() {
  local out="runs/round2/$1" ckpt
  [ -f "$out/test_metrics_comb.json" ] && return 0
  [ -f "results/round2/runs/$1/test_metrics_comb.json" ] && return 0
  if [ -d "$out/checkpoints/best-lsd" ]; then ckpt="$out/checkpoints/best-lsd"
  elif [ -f "$out/source_ckpt.txt" ]; then ckpt=$(cat "$out/source_ckpt.txt")
  else echo "no ckpt for comb backfill $1"; return 0; fi
  stop_check
  echo "=== comb backfill $1 $(date +%H:%M:%S) ==="
  timeout 900 python -m sot_tpu.cli evaluate --split test --ckpt "$ckpt" \
    --set eval_comb_correction=true \
    > "$out/test_metrics_comb.json" 2>> "$out.eval.log" || echo "COMB BACKFILL FAIL $1"
  persist_run "$1"
}

ANNEAL1500=(--set 'temperature_schedule=[1.0,0.1,1500]')

# --- one-time TPU kernel work (VERDICT tasks 2/6): merge-kernel A/B +
# train-step profile, ~10 min total, before the multi-hour train queue.
# Gated on the in-JSON completeness flag, not file existence. ---
if ! ab_done results/round2/sot_ab.json; then
  stop_check
  echo "=== sot kernel A/B $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_sot_ab.py > results/round2/sot_ab.log 2>&1 \
    || echo "A/B FAIL rc=$? (see results/round2/sot_ab.log): $(tail -2 results/round2/sot_ab.log | head -1)"
fi
if ! ab_done results/round2/refgrad_ab.json; then
  stop_check
  echo "=== refgrad (ref-convention merge bwd) A/B $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_refgrad_ab.py \
    > results/round2/refgrad_ab.log 2>&1 \
    || echo "A/B FAIL rc=$? (see results/round2/refgrad_ab.log): $(tail -2 results/round2/refgrad_ab.log | head -1)"
fi
if ! ab_done results/round2/conv_ab.json; then
  stop_check
  echo "=== conv kernel A/B $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_conv_ab.py > results/round2/conv_ab.log 2>&1 \
    || echo "CONV A/B FAIL rc=$? (see results/round2/conv_ab.log): $(tail -2 results/round2/conv_ab.log | head -1)"
fi
if ! ab_done results/round2/mss_ab.json; then
  stop_check
  echo "=== mss dft-matmul A/B $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_mss_ab.py > results/round2/mss_ab.log 2>&1 \
    || echo "MSS A/B FAIL rc=$? (see results/round2/mss_ab.log): $(tail -2 results/round2/mss_ab.log | head -1)"
fi
# profile AFTER the A/Bs so apply_auto_gates sees the winners
if [ ! -f results/round2/profile_step.txt ]; then
  stop_check
  echo "=== train-step profile $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/profile_step.py > results/round2/profile_step.txt 2> results/round2/profile_step.log \
    || echo "PROFILE FAIL (see results/round2/profile_step.log)"
fi
if [ ! -f results/round2/scaling_tpu1.json ]; then
  stop_check
  echo "=== single-chip scaling protocol $(date +%H:%M:%S) ==="
  timeout 1800 python bench_scaling.py 2>/dev/null | tail -1 > results/round2/scaling_tpu1.json \
    || echo "SCALING FAIL"
fi

# --- column B headline completion (SOT-2048 anneal-1500, 5 seeds; the
# round-1 anneal1500 checkpoints were wiped -> these retrain fresh) ---
train_one best/SOT-2048-101112 SOT-2048-Anneal 101112
evalonly_or_train best/SOT-2048-42  runs/tricks/anneal1500-42/checkpoints/best-lsd  SOT-2048-Anneal 42
evalonly_or_train best/SOT-2048-123 runs/tricks/anneal1500-123/checkpoints/best-lsd SOT-2048-Anneal 123
evalonly_or_train best/SOT-2048-456 runs/tricks/anneal1500-456/checkpoints/best-lsd SOT-2048-Anneal 456
evalonly_or_train best/SOT-2048-789 runs/tricks/anneal1500-789/checkpoints/best-lsd SOT-2048-Anneal 789

# --- remaining families, SEED-MAJOR so a partial sweep still covers every
# family at the leading seeds (the tunnel outage may truncate the queue).
# ref = reference protocol (column A); best = anneal-1500 (column B; the
# comb-corrected eval rides along via --final-eval). SS best trains to 50k:
# round 1 shows the family still escaping at 25k (89->91 RPA by 40k).
queue_seed() {
  local seed=$1
  train_one "ref/SOT-512-LogF-$seed" SOT-512-LogF "$seed"
  train_one "ref/SOT-512-$seed"      SOT-512      "$seed"
  train_one "ref/SOT-NoCut-$seed"    SOT-NoCut    "$seed"
  train_one "ref/SOT-2048-SS-$seed"  SOT-2048-SS  "$seed"
  if [ "$seed" = 42 ]; then
    evalonly_or_train best/SOT-512-42 \
      runs/tricks/sot512-anneal-42/checkpoints/best-lsd \
      SOT-512 42 "${ANNEAL1500[@]}"
  else
    train_one "best/SOT-512-$seed" SOT-512 "$seed" "${ANNEAL1500[@]}"
  fi
  if [ "$seed" = 42 ] && [ -d runs/tricks/sot2048ss-anneal-42-ext/checkpoints/last ]; then
    # same config+recipe already trained to 40k in round 1: resume the
    # last 10k instead of burning ~17 min of tunnel time on a fresh 50k
    train_one "best/SOT-2048-SS-42" SOT-2048-SS 42 \
      --steps 50000 "${ANNEAL1500[@]}" \
      --resume runs/tricks/sot2048ss-anneal-42-ext/checkpoints/last
  else
    train_one "best/SOT-2048-SS-$seed" SOT-2048-SS "$seed" \
      --steps 50000 "${ANNEAL1500[@]}"
  fi
  train_one "ref/MSS-Lin-$seed"    MSS-Lin    "$seed"
  train_one "ref/MSS-LogLin-$seed" MSS-LogLin "$seed"
}
for seed in 42 123 456 789 101112; do queue_seed "$seed"; done

# --- comb-correction backfill for runs completed before the comb eval ---
for d in runs/round2/ref/* runs/round2/best/*; do
  [ -d "$d" ] || continue
  comb_backfill "${d#runs/round2/}"
done

python scripts/collect_round2.py || true
echo "=== paper protocol queue done $(date +%H:%M:%S) ==="

# --- VERDICT task-1 addendum (lowest priority, after the full table): extra
# reference-protocol SOT-2048 seeds to pin the collapse-rate distribution
# (round 1 has only 5 seeds: 2 collapsed, mean 41.3(25.2)) ---
mkdir -p runs/round2/refextra
for seed in 7 555 777 999 1234 2024 31337 424242 654321 87654; do
  train_one "refextra/SOT-2048-$seed" SOT-2048 "$seed"
done
python scripts/collect_round2.py || true
echo "=== collapse-rate addendum done $(date +%H:%M:%S) ==="
