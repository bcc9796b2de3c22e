#!/bin/bash
# Round-5 chip queue.  Waits for the still-running round-4 queue
# (matrix_r4b.sh survived the round boundary), then:
#   1. retries any converged-matrix config that failed (VERDICT r4 item 1)
#   2. extends multi-seed coverage: PPGN sparse + NGNN dense seeds 1-2
#      (VERDICT item 7; reference repeat loop example/zinc.py:401,
#      --repeat arg :51)
#   3. (re)runs the measurement harnesses with the advisor's tmp->mv fix
#      so failed runs never leave a corrupt skip-triggering artifact
#      (ADVICE r4 medium finding)
# Resumable; logs to runs/logs/.
set -u
cd "$(dirname "$0")/.."
PY=${PY:-python}
EPOCHS=${EPOCHS:-400}
NTRAIN=${NTRAIN:-10000}
mkdir -p runs/converged runs/logs

# ---- wait for the r4 queue (if alive) --------------------------------
while pgrep -x bash >/dev/null && ps -o args= -C bash | grep -q matrix_r4b; do
  echo "r4b queue still running ($(date -u +%H:%M:%S)); sleeping 120 s"
  sleep 120
done
echo "r4b queue finished; starting r5 stage ($(date -u +%H:%M:%S))"

hps() {
  case "$1" in
    NGNN)   echo "--lr 1e-2   --wd 4.9e-5 --cosT 26 --normparam 1.94e-1 --minlr 8.4e-5  --K 4.9e-3  --K2 4.33e-6 --npool sum --lpool mean --cpool mean";;
    NGAT)   echo "--lr 1e-2   --wd 4.9e-5 --cosT 26 --normparam 1.94e-1 --minlr 8.4e-5  --K 4.9e-3  --K2 4.33e-6 --npool sum --lpool sum  --cpool mean";;
    SSWL)   echo "--lr 9e-3   --wd 6.5e-7 --cosT 40 --normparam 0.22    --minlr 8.4e-5  --K 1.4e-2  --K2 1.0e-7  --npool sum --lpool mean --cpool mean";;
    I2GNN)  echo "--lr 3.4e-3 --wd 3.7e-2 --cosT 26 --normparam 0.31    --minlr 2.03e-5 --K 0.011   --K2 0.0073  --npool sum --lpool mean --cpool mean";;
    PPGN)   echo "--lr 4.5e-3 --wd 6.5e-6 --cosT 32 --normparam 1.85e-1 --minlr 7.0e-5  --K 1.04e-4 --K2 8.24e-5 --npool sum --lpool mean --cpool mean";;
    DSSGNN) echo "--lr 0.0086 --wd 0.012  --cosT 26 --normparam 0.31    --minlr 8.9e-6  --K 1.3e-3  --K2 2.8e-4  --npool sum --lpool sum  --cpool mean";;
    GNNAK)  echo "--lr 0.0086 --wd 0.012  --cosT 26 --normparam 0.31    --minlr 8.9e-6  --K 1.3e-3  --K2 2.8e-4  --npool sum --lpool sum  --cpool mean";;
    SUN)    echo "--lr 0.0086 --wd 0.0064 --cosT 26 --normparam 0.57    --minlr 2.4e-5  --K 5.7e-7  --K2 2.8e-4  --npool sum --lpool sum  --cpool mean";;
    *) echo "unknown conv $1" >&2; exit 2;;
  esac
}
COMMON="--aggr sum --mlplayer 2 --norm bn --dp 0.0 --outlayer 4 --bs 128 --ntrain $NTRAIN --epochs $EPOCHS"

wait_tunnel() {
  local i
  for i in $(seq 1 30); do
    if timeout 120 $PY -c "
import jax
float(jax.numpy.ones(()).sum())" > /dev/null 2>&1; then return 0; fi
    echo "  tunnel unresponsive (probe $i); sleeping 60 s"
    sleep 60
  done
  return 1
}

run_conv() {  # $1=conv $2=sparse|dense $3=seed0 $4=repeat
  local conv=$1 mode=$2 seed0=${3:-0} repeat=${4:-1}
  local rec="runs/converged/${conv}_${mode}.json" done_marker
  if [ "$seed0" -gt 0 ] || [ "$repeat" -gt 1 ]; then
    done_marker="runs/converged/${conv}_${mode}.s$((seed0 + repeat - 1)).json"
  else
    done_marker="$rec"
  fi
  if [ -f "$done_marker" ]; then echo "SKIP $conv $mode s$seed0+$repeat"; return 0; fi
  local cmd log="runs/logs/converged_${conv}_${mode}_s${seed0}.log"
  if [ "$mode" = sparse ]; then
    cmd="$PY example/zinc_tpu.py --sparse --conv $conv --hop 3 $COMMON $(hps "$conv") --chained --fused --seed0 $seed0 --repeat $repeat --converged-record $rec"
  else
    cmd="$PY example/zinc_tpu.py --conv $conv --hop 4 $COMMON $(hps "$conv") --chained --seed0 $seed0 --repeat $repeat --converged-record $rec"
  fi
  echo "RUN  $conv $mode s$seed0+$repeat ($(date -u +%H:%M:%S)) -> $log"
  local ok=0 attempt rc
  for attempt in 1 2 3; do
    wait_tunnel || { echo "  tunnel down after 30 probes; counting as failed attempt" | tee -a "$log"; sleep 60; continue; }
    if timeout 10800 $cmd >> "$log" 2>&1; then ok=1; break; fi
    rc=$?
    echo "  attempt $attempt failed (rc=$rc); sleeping 60 s" | tee -a "$log"
    sleep 60
  done
  if [ $ok -eq 0 ] && [ "$mode" = sparse ]; then
    echo "  fused failed; unfused fallback" | tee -a "$log"
    timeout 10800 ${cmd/--chained --fused/--chained} >> "$log" 2>&1 && ok=1
  fi
  [ $ok -eq 1 ] && echo "DONE $conv $mode s$seed0 ($(date -u +%H:%M:%S))" || echo "FAIL $conv $mode s$seed0"
}

harness() {  # $1=name rest=cmd -- tmp->mv so failures never leave a
             # corrupt artifact that trips the skip guard (ADVICE r4)
  local name=$1; shift
  if [ -f "runs/${name}.json" ] && $PY -c "import json;json.load(open('runs/${name}.json'))" 2>/dev/null; then
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

# 1. measurement harnesses FIRST (validated-JSON skip + tmp->mv).
#    r4's defining weakness was building these and never firing them
#    (they sat behind ~4h of training configs and the round ended);
#    they are ~15-30 min each and close VERDICT r4 items 2/3/4.
harness dense_ablate_r4 python scripts/bench_dense_ablate.py
harness ngat_ablate_r4  python scripts/bench_ngat_ablate.py
harness giant_pv_r4     python scripts/bench_giant_pv.py

# 2. subgraphcount tuned (VERDICT r4 item 5), if r4b didn't finish it
if ! grep -q "FINAL" runs/logs/count_triangle_tuned.log 2>/dev/null; then
  echo "== count_triangle tuned ($(date -u +%H:%M:%S))"
  timeout 7200 python example/expressivity_tpu.py --dataset count \
    --conv I2GNN --target triangle --epochs 400 --hiddim 128 --num_layer 5 \
    --bs 64 --lr 3.4e-3 --cosT 26 --minlr 2.03e-5 --wd 3.7e-2 \
    --K 0.011 --K2 0.0073 --normparam 0.31 \
    > runs/logs/count_triangle_tuned.log 2>&1 \
    && tail -2 runs/logs/count_triangle_tuned.log || echo "FAIL count_triangle"
fi

# 3. retry anything the r4 queue failed to record (skips completed)
run_conv SSWL   sparse 0 1
run_conv DSSGNN sparse 0 1
run_conv GNNAK  sparse 0 1
run_conv SUN    sparse 0 1
run_conv I2GNN  sparse 0 1
run_conv NGAT   sparse 0 1
run_conv PPGN   dense  0 1
run_conv SSWL   dense  0 1

# 4. multi-seed extension (VERDICT item 7): 2 more seeds for the two
#    already-recorded non-NGNN-sparse configs
run_conv PPGN sparse 1 2
run_conv NGNN dense  1 2

echo "matrix_r5 complete ($(date -u +%H:%M:%S))"
