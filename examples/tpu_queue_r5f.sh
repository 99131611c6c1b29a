#!/bin/bash
# Round-5 sixth measurement pass. Chains on r5e (one TPU job at a time).
#   1. Bisect the scene-warmstart marathon dip (96.8 r5 vs 98.2 r3): same
#      cell with NEO_BANK=full. Lazy banking is selection-invariant by
#      test, so equal scores here point at round-4 solver/tracker drift or
#      closed-loop chaos, not the bank.
#   2. Single-replan latency refresh (BASELINE B=1 row, stale since r3).
#   3. Vision B=8192 probe (state ~300 KB/env -> ~2.4 GB + renderer bufs).
cd /root/repo
if [ -f /tmp/q_r5e.pid ]; then
    while kill -0 "$(cat /tmp/q_r5e.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== r5f queue start $(date +%H:%M:%S)"
echo "--- 1. scene-warmstart cell, full bank (bisect)"
NEO_BANK=full MAR_MODES=scene MAR_PLANNERS=warmstart timeout 3600 \
    python examples/marathon.py > /tmp/q_mar_ws_full.log 2>&1
echo "ws_full exit=$? $(date +%H:%M:%S)"; tail -4 /tmp/q_mar_ws_full.log
echo "--- 2. replan latency (full + trim profiles)"
timeout 2400 python examples/latency.py > /tmp/q_latency.log 2>&1
echo "lat_full exit=$?"; tail -3 /tmp/q_latency.log
LAT_PROFILE=trim timeout 2400 python examples/latency.py \
    > /tmp/q_latency_trim.log 2>&1
echo "lat_trim exit=$?"; tail -3 /tmp/q_latency_trim.log
echo "--- 3. vision B=8192 probe"
VIS_B=8192 VIS_BREAKDOWN=0 VIS_SEGMENTS=2 timeout 4800 \
    python examples/profile_vision.py > /tmp/q_vis8192.log 2>&1
echo "vis8192 exit=$? $(date +%H:%M:%S)"; tail -4 /tmp/q_vis8192.log
echo "=== r5f queue done $(date +%H:%M:%S)"
