#!/bin/sh
# Equivalent of the reference tools/run_rpe.sh: fixed-delta (1 s) RPE.
GT=${1:?usage: run_rpe.sh <groundtruth.txt> <estimate.txt>}
EST=${2:?usage: run_rpe.sh <groundtruth.txt> <estimate.txt>}
python -m rgbd_visualodometry_tpu.evaltools.cli rpe "$GT" "$EST" --delta 1.0
