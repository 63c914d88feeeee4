#!/bin/bash
# Round-4 post-queue phase: runs once the training queue is done and the
# tunnel is otherwise idle (A/B timing must not share the chip with a
# training stream). Idempotent: each step gates on its artifact.
set -u
cd /root/repo
[ -d /opt/venv/bin ] && export PATH="/opt/venv/bin:$PATH"
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

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

if ! ab_done results/round2/cqt_ab.json; then
  echo "=== cqt A/B $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/bench_cqt_ab.py > results/round2/cqt_ab.log 2>&1 \
    || echo "CQT A/B FAIL rc=$? $(tail -2 results/round2/cqt_ab.log | head -1)"
  git add results/round2/cqt_ab.json results/round2/cqt_ab.log 2>/dev/null
  git commit -q -m "CQT A/B: XLA gather+matmul vs fused Pallas frame-slab kernel" \
    -- results/round2/cqt_ab.json results/round2/cqt_ab.log 2>/dev/null || true
fi

if [ ! -f results/round4/profile_step_post.txt ]; then
  echo "=== post profile $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/profile_step.py > results/round4/profile_step_post.txt \
    2> results/round4/profile_step_post.log || echo "PROFILE FAIL"
  git add results/round4/profile_step_post.txt results/round4/profile_step_post.log 2>/dev/null
  git commit -q -m "Post-queue profile under final round-4 gates" \
    -- results/round4 2>/dev/null || true
fi

if [ ! -f results/round4/bench_post.json ]; then
  echo "=== bench $(date +%H:%M:%S) ==="
  timeout 1800 python bench.py 2>/dev/null | tail -1 > results/round4/bench_post.json \
    || echo "BENCH FAIL"
  git add results/round4/bench_post.json 2>/dev/null
  git commit -q -m "Round-4 bench under final gates" -- results/round4/bench_post.json 2>/dev/null || true
fi

python scripts/collect_round2.py || true
git add results/round2/synthetic_results_best-lsd.json \
  results/round2/synthetic_results_paper_best-lsd.json \
  results/round2/synthetic_results_paper_best-lsd.csv \
  results/round2/sot2048_collapse.json 2>/dev/null
git commit -q -m "Round-4 paper-table refresh after LogF/NoCut tuning" \
  -- results/round2 2>/dev/null || true
echo "=== round-4 post phase done $(date +%H:%M:%S) ==="
