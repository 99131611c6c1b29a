#!/bin/bash
# Round-5 fifth measurement pass (replaces the r5d waiter, which was killed
# before starting: the 640x480 retry must come first — its renderer fix
# (vmem_limit_bytes for big frames, raycast_pallas._vmem_params) is the
# riskiest compile and the marathon should not block it for 2.5 h).
# One TPU job at a time (CLAUDE.md rule 10): waits for the r5c bench.
cd /root/repo
if [ -f /tmp/q_r5c.pid ]; then
    while kill -0 "$(cat /tmp/q_r5c.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== r5e queue start $(date +%H:%M:%S)"

echo "--- 1. onboard 640x480 pipeline (vmem-limit renderer fix)"
VIS_NET=artifacts/planner_net_resnet640 VIS_B=128 timeout 4800 \
    python examples/profile_vision.py > /tmp/q_vis640c.log 2>&1
echo "vis640c exit=$? $(date +%H:%M:%S)"; tail -10 /tmp/q_vis640c.log

echo "--- 2. onboard 640x480 with bf16 NN inference (NEO_NN_DTYPE A/B)"
NEO_NN_DTYPE=bf16 VIS_NET=artifacts/planner_net_resnet640 VIS_B=128 \
    VIS_BREAKDOWN=0 timeout 3600 \
    python examples/profile_vision.py > /tmp/q_vis640bf16.log 2>&1
echo "vis640bf16 exit=$? $(date +%H:%M:%S)"; tail -4 /tmp/q_vis640bf16.log

echo "--- 3. marathon re-certification (round-5 default stack)"
timeout 9000 python examples/marathon.py > /tmp/q_marathon_r5.log 2>&1
echo "marathon exit=$? $(date +%H:%M:%S)"; tail -16 /tmp/q_marathon_r5.log

echo "--- 4. scene B=8192 probe"
BENCH_ENVS=8192 BENCH_BREAKDOWN=0 timeout 3600 python bench.py \
    > /tmp/q_bench_b8192.log 2>&1
echo "b8192 exit=$? $(date +%H:%M:%S)"; tail -2 /tmp/q_bench_b8192.log

echo "--- 5. flagship B=1024 row"
BENCH_ENVS=1024 BENCH_BREAKDOWN=0 timeout 1800 python bench.py \
    > /tmp/q_bench_b1024.log 2>&1
echo "b1024 exit=$? $(date +%H:%M:%S)"; tail -2 /tmp/q_bench_b1024.log

echo "=== r5e queue done $(date +%H:%M:%S)"
