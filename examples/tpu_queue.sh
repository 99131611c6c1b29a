#!/bin/bash
# One TPU job at a time (CLAUDE.md rule 10). Run everything sequentially.
cd /root/repo
echo "=== queue start $(date +%H:%M:%S)"
echo "--- 0. fused EDT kernel check"
timeout 2000 python examples/edt_check.py 512 > /tmp/q_edt.log 2>&1
echo "edt exit=$? $(date +%H:%M:%S)"; tail -6 /tmp/q_edt.log
echo "--- 1. bench.py flagship (validates tracker trace change, warms driver cache)"
timeout 3000 python bench.py > /tmp/q_bench.log 2>&1
echo "bench exit=$? $(date +%H:%M:%S)"; tail -2 /tmp/q_bench.log
echo "--- 1b. scene stage profile (early-exit solver A/B)"
timeout 3000 python examples/profile_stages.py > /tmp/q_stages.log 2>&1
echo "stages exit=$? $(date +%H:%M:%S)"; tail -10 /tmp/q_stages.log
echo "--- 2. vision glue profile B=4096"
timeout 4000 python examples/profile_vision_glue.py > /tmp/q_vglue.log 2>&1
echo "vglue exit=$? $(date +%H:%M:%S)"; tail -16 /tmp/q_vglue.log
echo "--- 3. profile_vision B=512"
timeout 3000 python examples/profile_vision.py > /tmp/q_vis512.log 2>&1
echo "vis512 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis512.log
echo "--- 4. profile_vision B=4096"
VIS_B=4096 timeout 3600 python examples/profile_vision.py > /tmp/q_vis4096.log 2>&1
echo "vis4096 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis4096.log
echo "--- 5. marathon vision neo+expert, row stride 4"
MAR_ROW_STRIDE=4 MAR_MODES=vision MAR_PLANNERS=neo,expert timeout 6000 python examples/marathon.py > /tmp/q_marathon.log 2>&1
echo "marathon exit=$? $(date +%H:%M:%S)"; tail -12 /tmp/q_marathon.log
echo "=== queue done $(date +%H:%M:%S)"
echo "--- 6. onboard 640x480 resnet640 B=128"
VIS_NET=/root/repo/artifacts/planner_net_resnet640 VIS_B=128 timeout 4000 python examples/profile_vision.py > /tmp/q_vis640.log 2>&1
echo "vis640 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis640.log
echo "--- 7. vision B=2048"
VIS_B=2048 timeout 3000 python examples/profile_vision.py > /tmp/q_vis2048.log 2>&1
echo "vis2048 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis2048.log
echo "=== queue fully done $(date +%H:%M:%S)"
