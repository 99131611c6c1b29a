#!/bin/bash
# Round-5 tenth pass: refresh the scaling rows on the post-polar-rewrite
# stack. One TPU job at a time; host is 1-core — nothing else may run.
#   1. bench.py at B=8192 (candidate new default: r5 sweep measured 5796.5k
#      there vs 5605.3k at 4096 — re-validate on today's stack).
#   2. profile_vision B=512 / B=2048 (rows predate the polar rewrite).
#   3. onboard 640x480 resnet640 loop (row predates the rewrite).
cd /root/repo
echo "=== r5j queue start $(date +%H:%M:%S)"
echo "--- 1. bench B=8192"
BENCH_ENVS=8192 BENCH_BREAKDOWN=0 timeout 4800 python bench.py \
    > /tmp/q_bench8192_r5j.log 2>&1
echo "bench8192 exit=$? $(date +%H:%M:%S)"; tail -2 /tmp/q_bench8192_r5j.log
echo "--- 2a. profile_vision B=512"
VIS_B=512 VIS_BREAKDOWN=0 timeout 4800 python examples/profile_vision.py \
    > /tmp/q_vis512_r5j.log 2>&1
echo "vis512 exit=$? $(date +%H:%M:%S)"; tail -3 /tmp/q_vis512_r5j.log
echo "--- 2b. profile_vision B=2048"
VIS_B=2048 VIS_BREAKDOWN=0 timeout 4800 python examples/profile_vision.py \
    > /tmp/q_vis2048_r5j.log 2>&1
echo "vis2048 exit=$? $(date +%H:%M:%S)"; tail -3 /tmp/q_vis2048_r5j.log
echo "--- 3. onboard 640x480"
VIS_NET=artifacts/planner_net_resnet640 VIS_B=128 VIS_BREAKDOWN=0 \
    timeout 4800 python examples/profile_vision.py \
    > /tmp/q_vis640_r5j.log 2>&1
echo "vis640 exit=$? $(date +%H:%M:%S)"; tail -3 /tmp/q_vis640_r5j.log
echo "=== r5j queue done $(date +%H:%M:%S)"
