#!/bin/bash
# Sequential TPU artifact capture: ONE process on the chip at a time, with
# teardown gaps (concurrent runs / fast back-to-back starts hit
# FAILED_PRECONDITION races on the remote platform).  Run from /root/repo:
#   nohup bash tools/capture_all.sh > /tmp/capture_all.log 2>&1 &
set -x
cd /root/repo

run() {  # run <timeout_s> <logfile> <cmd...>
  timeout "$1" "${@:3}" > "$2" 2>&1
  echo "=== exit=$? $2"
  sleep 20
}

run 2400 /tmp/cap_bench.log      python bench.py --sizes 500 1000
run 5400 /tmp/cap_exp1.log       python experiments/experiment_1.py --sizes 10 50 100 250 500 1000
run 1800 /tmp/cap_exp2.log       python experiments/experiment_2.py
run 3600 /tmp/cap_ipacc.log      python experiments/experiment_ip_accuracy.py --sizes 500 1000
run 1800 /tmp/cap_serving.log    python experiments/experiment_serving.py
run 1800 /tmp/cap_hard.log       python experiments/experiment_1_hard.py
run 1800 /tmp/cap_aa.log         python experiments/experiment_aa.py
run 3600 /tmp/cap_exp1paper.log  python experiments/experiment_1_paper.py
run 1800 /tmp/cap_straggler.log  python experiments/experiment_straggler.py
run 2400 /tmp/cap_straggler1k.log python experiments/experiment_straggler.py --n-x 1000
python experiments/experiment_2_paper.py > /tmp/cap_exp2paper.log 2>&1
echo "=== exp2_paper exit=$?"
python experiments/render_readme.py > /tmp/cap_render.log 2>&1
echo "=== render exit=$?"
echo "ALL CAPTURES DONE"
