#!/bin/bash
# Round-5 third measurement pass. Waits for the r5b queue (one TPU job at a
# time, CLAUDE.md rule 10), then:
#   1. 640x480 onboard pipeline retry — the r5b run died in the renderer
#      kernel's scoped-VMEM OOM at full camera res (20.87M > 16M); fixed by
#      adaptive envs-per-program (raycast_pallas._envs_per_program).
#   2. fresh flagship bench — records the new fetch_roundtrip_ms /
#      *_device_ms extras and warms the compile cache for the driver's
#      end-of-round bench run.
cd /root/repo
if [ -f /tmp/q_r5b.pid ]; then
    while kill -0 "$(cat /tmp/q_r5b.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== r5c queue start $(date +%H:%M:%S)"
echo "--- 1. onboard 640x480 pipeline (renderer VMEM fix)"
VIS_NET=artifacts/planner_net_resnet640 VIS_B=128 timeout 4800 \
    python examples/profile_vision.py > /tmp/q_vis640b.log 2>&1
echo "vis640b exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis640b.log
echo "--- 2. flagship bench (roundtrip-aware extras, cache warm)"
timeout 3600 python bench.py > /tmp/q_bench_r5c.log 2>&1
echo "bench_r5c exit=$? $(date +%H:%M:%S)"; tail -2 /tmp/q_bench_r5c.log
echo "=== r5c queue done $(date +%H:%M:%S)"
