#!/bin/bash
# Round-4 first measurement pass (one TPU job at a time, CLAUDE.md rule 10).
cd /root/repo
echo "=== r4a queue start $(date +%H:%M:%S)"
echo "--- 1. bench.py flagship"
timeout 3000 python bench.py > /tmp/q_bench.log 2>&1
echo "bench exit=$? $(date +%H:%M:%S)"; tail -3 /tmp/q_bench.log
echo "--- 2. scene stage profile (early-exit solver A/B)"
timeout 3000 python examples/profile_stages.py > /tmp/q_stages.log 2>&1
echo "stages exit=$? $(date +%H:%M:%S)"; tail -12 /tmp/q_stages.log
echo "--- 3. vision glue profile B=4096"
timeout 4000 python examples/profile_vision_glue.py > /tmp/q_vglue.log 2>&1
echo "vglue exit=$? $(date +%H:%M:%S)"; tail -16 /tmp/q_vglue.log
echo "--- 4. profile_vision B=512"
timeout 3000 python examples/profile_vision.py > /tmp/q_vis512.log 2>&1
echo "vis512 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis512.log
echo "--- 5. profile_vision B=4096"
VIS_B=4096 timeout 3600 python examples/profile_vision.py > /tmp/q_vis4096.log 2>&1
echo "vis4096 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis4096.log
echo "=== r4a queue done $(date +%H:%M:%S)"
