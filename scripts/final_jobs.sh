#!/bin/bash
# Final background stage: after the chip measurement queue drains, re-run
# bench_scaling.py on a QUIET machine (the first recording ran while the
# converged matrix's host process was live) and refresh bench.py so the
# round artifact carries the full converged matrix.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "measurement queue complete" /tmp/post_matrix.log 2>/dev/null; do
  sleep 120
done
echo "queue drained; re-running scaling on quiet host"
timeout 7200 python bench_scaling.py > runs/scaling_r4_quiet.json \
  2> runs/logs/scaling_r4_quiet.log && echo "OK scaling quiet"

echo "refreshing bench.py record"
timeout 3600 python bench.py > runs/bench_refresh_r4.json \
  2> runs/logs/bench_refresh_r4.log && echo "OK bench refresh"
echo "final jobs complete"

# fused converged reruns for any conv whose fused chained path failed
# during the matrix (smem/stacking bugs fixed mid-round): PPGN sparse
# (multi-launch plan stacking, fixed by common per-block step tables)
echo "== PPGN fused (stacking-fix validation)"
timeout 14400 python example/zinc_tpu.py --sparse --conv PPGN --hop 3 \
  --aggr sum --mlplayer 2 --norm bn --dp 0.0 --outlayer 4 --bs 128 \
  --ntrain 10000 --epochs 500 --npool sum --lpool mean --cpool mean \
  --lr 4.5e-3 --wd 6.5e-6 --cosT 32 --normparam 1.85e-1 --minlr 7.0e-5 \
  --K 1.04e-4 --K2 8.24e-5 --chained --fused \
  --converged-record runs/converged/PPGN_sparse_fused.json \
  > runs/logs/converged_PPGN_fused.log 2>&1 \
  && echo "OK PPGN fused" || echo "FAIL PPGN fused"
echo "final jobs complete (v2)"
