#!/bin/bash
# Chip-measurement queue for after the converged matrix: waits for the
# matrix runner to finish, then runs the r4 measurement harnesses
# sequentially (one chip).  Logs to runs/logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

echo "waiting for converged matrix to finish..."
while ! grep -q "matrix complete" /tmp/matrix_run.log 2>/dev/null; do
  sleep 120
done
echo "matrix complete; starting measurement queue"

run() {
  name=$1; shift
  echo "== $name"
  timeout 7200 "$@" > "runs/${name}.json" 2> "runs/logs/${name}.log" \
    && echo "OK $name" || echo "FAIL $name (see runs/logs/${name}.log)"
}

# 1. dense-DD breakdown (VERDICT item 2)
run dense_ablate_r4 python scripts/bench_dense_ablate.py

# 2. NGAT epoch accounting (VERDICT item 6)
run ngat_ablate_r4 python scripts/bench_ngat_ablate.py

# 3. giant-graph pv A/B (VERDICT item 3)
run giant_pv_r4 python scripts/bench_giant_pv.py

# 4. subgraphcount tuned runs (VERDICT item 7): I2GNN ZINC-tuned HPs,
#    longer cosine-restart schedule, wider model
for tgt in triangle; do
  echo "== count_$tgt tuned"
  timeout 7200 python example/expressivity_tpu.py --dataset count \
    --conv I2GNN --target $tgt --epochs 400 --hiddim 128 --num_layer 5 \
    --bs 64 --lr 3.4e-3 --cosT 26 --minlr 2.03e-5 --wd 3.7e-2 \
    --K 0.011 --K2 0.0073 --normparam 0.31 \
    > runs/logs/count_${tgt}_tuned.log 2>&1 \
    && tail -1 runs/logs/count_${tgt}_tuned.log || echo "FAIL count_$tgt"
done

# 5. SSWL fused converged re-run (validates the smem fix end-to-end and
#    upgrades the unfused-fallback artifact)
echo "== SSWL fused (smem-fix validation)"
timeout 14400 python example/zinc_tpu.py --sparse --conv SSWL --hop 3 \
  --aggr sum --mlplayer 2 --norm bn --dp 0.0 --outlayer 4 --bs 128 \
  --ntrain 10000 --epochs 500 --npool sum --lpool mean --cpool mean \
  --lr 9e-3 --wd 6.5e-7 --cosT 40 --normparam 0.22 --minlr 8.4e-5 \
  --K 1.4e-2 --K2 1.0e-7 --chained --fused \
  --converged-record runs/converged/SSWL_sparse_fused.json \
  > runs/logs/converged_SSWL_fused.log 2>&1 \
  && echo "OK SSWL fused" || echo "FAIL SSWL fused"

echo "measurement queue complete"
