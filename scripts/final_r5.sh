#!/bin/bash
# Post-matrix r5 stage: waits for matrix_r5.sh to finish, then
#   1. re-runs the NGAT ablate (after the _att_proj bf16/concat change)
#      -> runs/ngat_ablate_r5.json  (paired with r4: NGNN row is the
#      session-drift control)
#   2. re-runs the dense ablate (after the cw train-kernel default flip)
#      -> runs/dense_ablate_r5.json
#   3. refreshes bench.py -> runs/bench_r5_final.json
# Resumable; tmp->mv so failures never leave a skip-triggering artifact.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

# wait on the queue SHELL itself, excluding this process and its
# ancestors (a wrapper like `bash -c 'matrix_r5.sh; final_r5.sh'`
# would otherwise match its own args forever)
queue_alive() {
  local pid
  for pid in $(pgrep -f "bash scripts/matrix_r5.sh" 2>/dev/null); do
    [ "$pid" = "$$" ] && continue
    local anc=$$
    local is_anc=0
    while [ "$anc" -gt 1 ] 2>/dev/null; do
      anc=$(ps -o ppid= -p "$anc" 2>/dev/null | tr -d ' ') || break
      [ "$anc" = "$pid" ] && { is_anc=1; break; }
    done
    [ "$is_anc" = 0 ] && return 0
  done
  return 1
}
while queue_alive; do
  sleep 180
done
echo "matrix_r5 done; final stage starts ($(date -u +%H:%M:%S))"

harness() {
  local name=$1; shift
  if [ -f "runs/${name}.json" ] && python -c "import json;json.load(open('runs/${name}.json'))" 2>/dev/null; then
    echo "SKIP $name"; return 0
  fi
  rm -f "runs/${name}.json"
  echo "== $name ($(date -u +%H:%M:%S))"
  if timeout 7200 "$@" > "runs/${name}.json.tmp" 2> "runs/logs/${name}.log"; then
    mv "runs/${name}.json.tmp" "runs/${name}.json" && echo "OK $name"
  else
    rm -f "runs/${name}.json.tmp"; echo "FAIL $name (runs/logs/${name}.log)"
  fi
}

# order = value under round-end time pressure: the NGAT re-measure is
# the paired A/B for the r5 projection fix; giant_pv_r5 is the
# deciding artifact for the plan-transfer CORRECTION (the r4-named one
# passed HOST plans as jit args); dense last; bench.py is run by the
# driver anyway at round end.
harness ngat_ablate_r5  python scripts/bench_ngat_ablate.py
harness giant_pv_r5     python scripts/bench_giant_pv.py
harness dense_ablate_r5 python scripts/bench_dense_ablate.py
echo "final_r5 complete ($(date -u +%H:%M:%S))"
