#!/bin/bash
# Round-4 (restarted container) chip queue: converged benchmark matrix
# (VERDICT r3 item 1) at 400 epochs (protocol minimum), ordered so the
# highest-value artifacts land first if the session is cut short, then
# the r4 measurement harnesses (items 2/3/6/7).  Resumable: completed
# records are skipped.  Logs to runs/logs/.
set -u
cd "$(dirname "$0")/.."
PY=${PY:-python}
EPOCHS=${EPOCHS:-400}
NTRAIN=${NTRAIN:-10000}
mkdir -p runs/converged runs/logs

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
  # the axon tunnel has multi-minute outage windows (CLAUDE.md); block
  # until a cheap op round-trips so attempts don't burn on a dead link
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

run_conv() {  # $1=conv $2=sparse|dense $3=repeat
  local conv=$1 mode=$2 repeat=${3:-1}
  local rec="runs/converged/${conv}_${mode}.json"
  if [ -f "$rec" ] || { [ "$repeat" -gt 1 ] && [ -f "${rec%.json}.s$((repeat-1)).json" ]; }; then
    echo "SKIP $conv $mode"; return 0
  fi
  local cmd log="runs/logs/converged_${conv}_${mode}.log"
  if [ "$mode" = sparse ]; then
    cmd="$PY example/zinc_tpu.py --sparse --conv $conv --hop 3 $COMMON $(hps "$conv") --chained --fused --repeat $repeat --converged-record $rec"
  else
    cmd="$PY example/zinc_tpu.py --conv $conv --hop 4 $COMMON $(hps "$conv") --chained --repeat $repeat --converged-record $rec"
  fi
  echo "RUN  $conv $mode ($(date -u +%H:%M:%S)) -> $log"
  local ok=0 attempt rc
  for attempt in 1 2 3; do
    wait_tunnel
    if timeout 10800 $cmd >> "$log" 2>&1; then ok=1; break; fi
    rc=$?
    echo "  attempt $attempt failed (rc=$rc); sleeping 60 s" | tee -a "$log"
    sleep 60
  done
  if [ $ok -eq 0 ] && [ "$mode" = sparse ]; then
    echo "  fused failed twice; unfused fallback" | tee -a "$log"
    timeout 10800 ${cmd/--chained --fused/--chained} >> "$log" 2>&1 && ok=1
  fi
  [ $ok -eq 1 ] && echo "DONE $conv $mode ($(date -u +%H:%M:%S))" || echo "FAIL $conv $mode"
}

harness() {  # $1=name rest=cmd
  local name=$1; shift
  [ -f "runs/${name}.json" ] && { echo "SKIP $name"; return 0; }
  echo "== $name ($(date -u +%H:%M:%S))"
  timeout 7200 "$@" > "runs/${name}.json" 2> "runs/logs/${name}.log" \
    && echo "OK $name" || echo "FAIL $name (runs/logs/${name}.log)"
}

run_conv NGNN   sparse 3
run_conv PPGN   sparse 1
run_conv NGNN   dense  1
run_conv SSWL   sparse 1
run_conv DSSGNN sparse 1
run_conv GNNAK  sparse 1
run_conv SUN    sparse 1
run_conv I2GNN  sparse 1
run_conv NGAT   sparse 1
run_conv PPGN   dense  1

harness giant_pv_r4    python scripts/bench_giant_pv.py
harness dense_ablate_r4 python scripts/bench_dense_ablate.py
harness ngat_ablate_r4  python scripts/bench_ngat_ablate.py

# subgraphcount tuned (VERDICT item 7)
if [ ! -f runs/logs/count_triangle_tuned.log ] || \
   ! grep -q "FINAL" runs/logs/count_triangle_tuned.log 2>/dev/null; then
  echo "== count_triangle tuned ($(date -u +%H:%M:%S))"
  timeout 7200 python example/expressivity_tpu.py --dataset count \
    --conv I2GNN --target triangle --epochs 400 --hiddim 128 --num_layer 5 \
    --bs 64 --lr 3.4e-3 --cosT 26 --minlr 2.03e-5 --wd 3.7e-2 \
    --K 0.011 --K2 0.0073 --normparam 0.31 \
    > runs/logs/count_triangle_tuned.log 2>&1 \
    && tail -2 runs/logs/count_triangle_tuned.log || echo "FAIL count_triangle"
fi

run_conv SSWL dense 1
echo "matrix_r4b complete"
