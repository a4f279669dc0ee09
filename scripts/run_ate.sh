#!/bin/sh
# Equivalent of the reference tools/run_ate.sh: ATE of an estimated
# trajectory against groundtruth.txt (TUM format).
GT=${1:?usage: run_ate.sh <groundtruth.txt> <estimate.txt>}
EST=${2:?usage: run_ate.sh <groundtruth.txt> <estimate.txt>}
python -m rgbd_visualodometry_tpu.evaltools.cli ate "$GT" "$EST" --verbose
