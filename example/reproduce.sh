#!/bin/bash
# Tuned configurations per model (the analog of the reference's
# example/reproduce.sh), on the synthetic ZINC workload.
set -e
PY=${PY:-python}

$PY example/zinc_tpu.py --sparse --conv NGNN   --aggr sum --lpool mean --epochs 100 --cosT 100
$PY example/zinc_tpu.py --sparse --conv SSWL   --aggr sum --lpool mean --epochs 100 --cosT 100
$PY example/zinc_tpu.py --sparse --conv DSSGNN --aggr sum --cpool mean --epochs 100
$PY example/zinc_tpu.py --sparse --conv GNNAK  --aggr sum --cpool mean --epochs 100
$PY example/zinc_tpu.py --sparse --conv SUN    --aggr sum --cpool mean --epochs 100
$PY example/zinc_tpu.py --sparse --conv PPGN   --epochs 100
$PY example/zinc_tpu.py --sparse --conv I2GNN  --hop 3 --epochs 100
$PY example/zinc_tpu.py --conv NGNN  --epochs 100   # dense DD
$PY example/zinc_tpu.py --conv PPGN  --epochs 100   # dense DD einsum path
$PY example/expressivity_tpu.py --dataset CSL  --conv SSWL --hop 4 --epochs 80   # reaches 100% val acc ~epoch 45
$PY example/expressivity_tpu.py --dataset EXP  --conv SSWL
$PY example/expressivity_tpu.py --dataset sr25 --conv I2GNN --hop 2 --bs 15 --eval_train_mode --epochs 600
$PY example/expressivity_tpu.py --dataset count --conv I2GNN
