#!/bin/bash
# Round-5 training queue (VERDICT round-4 tasks 1, 2, 5):
#
# PRE-REGISTERED PROTOCOL (committed before any result lands):
#  P1 — SOT-2048-SS-Probes uniform 5-seed protocol (task 2): the committed
#    preset (anneal-1500 + 8x1k init probes + 50k), comb eval, all 5 paper
#    seeds INCLUDING a fresh 456 (the round-4 rescue run is evidence, not a
#    protocol row). The row is adopted WHATEVER it says via
#    scripts/apply_r5_refresh.py.
#  P2 — MSS init-probe probes (task 5): seed-42 MSS-Lin / MSS-LogLin with
#    n_init_probes=8 probe_steps=1000. Decision rule (pre-registered): if
#    probe comb RPA beats the refreshed ref-protocol comb RPA at seed 42 by
#    >5 points, the remaining 4 seeds run with probes and the family's
#    column-B recipe flips to best+comb (collector 'auto' resolution);
#    otherwise the negative is committed and ref+comb stands.
#  P3 — SOT-2048-Anneal x5 (task 1, column B flagship) under --kernels auto.
#  P4 — Column A: ALL 7 families x 5 seeds, reference protocol (no tricks),
#    --kernels auto, 25k (task 1). Family order = value order in case the
#    round ends mid-phase: SOT-2048, MSS-Lin, MSS-LogLin, SOT-2048-SS,
#    SOT-512, SOT-512-LogF, SOT-NoCut.
#  P5 — SOT-512 column B (anneal-1500) x5 under auto.
#  P6 — adaptive MSS column-B fill per the P2 rule.
#  P7 — scripts/apply_r5_refresh.py: per family+column, the refreshed rows
#    replace the old ones IFF all 5 seeds completed (old rows stay in git
#    history); then collect_round2.py regenerates the table.
#
# Same conventions as round4_queue.sh: resumable done-markers,
# `touch runs/round2/STOP` pauses between runs, metrics mirrored into
# git-tracked results/round2/runs/ and committed immediately.
set -u
cd /root/repo
[ -d /opt/venv/bin ] && export PATH="/opt/venv/bin:$PATH"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs/round2/r5 results/round2/runs/r5

stop_check() { [ -f runs/round2/STOP ] && { echo "STOP file present, exiting"; exit 0; }; }

run_done() {
  [ -f "runs/round2/$1/test_metrics_octcorr.json" ] && return 0
  [ -f "results/round2/runs/$1/test_metrics.json" ]
}

persist_run() {
  local out="runs/round2/$1" dst="results/round2/runs/$1"
  mkdir -p "$dst"
  cp -f "$out"/test_metrics*.json "$dst"/ 2>/dev/null || true
  for attempt in 1 2 3; do
    git add -- "$dst" >/dev/null 2>&1 && \
    git commit -q -m "Mirror run metrics: $1" -- "$dst" >/dev/null 2>&1 && break
    sleep 5
  done
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
train_one() {
  local sub=$1 exp=$2 seed=$3; shift 3
  local out="runs/round2/$sub"
  stop_check
  if run_done "$sub"; then echo "skip $sub"; return 0; fi
  echo "=== train $sub ($exp seed $seed) $(date +%H:%M:%S) ==="
  for attempt in 1 2; do
    timeout 3600 python -m sot_tpu.cli train --experiment "$exp" --seed "$seed" \
      --kernels auto --out "$out" --final-eval "$@" > "$out.train.log" 2>&1
    rc=$?
    if [ $rc -eq 0 ] && [ -f "$out/test_metrics_octcorr.json" ]; then
      persist_run "$sub"
      case "$sub" in r5/b-*-42) persist_ckpt "$sub";; esac
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

SEEDS="42 123 456 789 101112"
A1500='temperature_schedule=[1.0,0.1,1500]'

# ---------- P1: SOT-2048-SS-Probes uniform 5-seed protocol ------------------
for seed in $SEEDS; do
  train_one "r5/b-SOT-2048-SS-$seed" SOT-2048-SS-Probes "$seed" --steps 50000
done

# ---------- P2: MSS init-probe probes (seed 42) -----------------------------
train_one r5/mssprobe-MSS-Lin-42    MSS-Lin    42 --set n_init_probes=8 --set probe_steps=1000
train_one r5/mssprobe-MSS-LogLin-42 MSS-LogLin 42 --set n_init_probes=8 --set probe_steps=1000

# ---------- P3: SOT-2048-Anneal x5 (column B flagship) ----------------------
for seed in $SEEDS; do
  train_one "r5/b-SOT-2048-$seed" SOT-2048-Anneal "$seed"
done

# ---------- P4: column A — all families, reference protocol -----------------
for fam in SOT-2048 MSS-Lin MSS-LogLin SOT-2048-SS SOT-512 SOT-512-LogF SOT-NoCut; do
  for seed in $SEEDS; do
    train_one "r5/ref-$fam-$seed" "$fam" "$seed"
  done
  # apply incrementally so a mid-phase round end still lands complete families
  python scripts/apply_r5_refresh.py --quiet || true
done

# ---------- P5: SOT-512 column B (anneal-1500) ------------------------------
for seed in $SEEDS; do
  train_one "r5/b-SOT-512-$seed" SOT-512 "$seed" --set "$A1500"
done

# ---------- P6: adaptive MSS column-B fill (pre-registered rule) ------------
for fam in MSS-Lin MSS-LogLin; do
  RPROBE=$(rpa "r5/mssprobe-$fam-42" comb)
  RREF=$(rpa "r5/ref-$fam-42" comb)
  echo "MSS probe rule $fam: probe=$RPROBE ref=$RREF"
  if python3 -c "import sys; sys.exit(0 if float('$RPROBE') > float('$RREF') + 5 else 1)"; then
    mkdir -p "runs/round2/r5/b-$fam-42"
    cp -f "runs/round2/r5/mssprobe-$fam-42"/test_metrics*.json "runs/round2/r5/b-$fam-42/" 2>/dev/null || \
      cp -f "results/round2/runs/r5/mssprobe-$fam-42"/test_metrics*.json "runs/round2/r5/b-$fam-42/" || true
    persist_run "r5/b-$fam-42"
    for seed in 123 456 789 101112; do
      train_one "r5/b-$fam-$seed" "$fam" "$seed" --set n_init_probes=8 --set probe_steps=1000
    done
  else
    echo "MSS probes negative for $fam (probe=$RPROBE vs ref=$RREF): ref+comb stands"
  fi
done

# ---------- P7: apply + collect ---------------------------------------------
python scripts/apply_r5_refresh.py || true
python scripts/collect_round2.py || true
echo "=== round-5 queue done $(date +%H:%M:%S) ==="
