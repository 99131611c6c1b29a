#!/bin/bash
# Round-5 ninth pass: split the vision plan stage (~204 ms standalone, ~80%
# of the 250.7 ms B=4096 segment after the polar_columns HBM rewrite) into
# solver / acceptance / NN / glue with the new profile_vision_glue probes.
cd /root/repo
echo "=== r5i queue start $(date +%H:%M:%S)"
PROF_B=4096 timeout 4800 python examples/profile_vision_glue.py \
    > /tmp/q_vglue_r5i.log 2>&1
echo "vglue exit=$? $(date +%H:%M:%S)"; tail -22 /tmp/q_vglue_r5i.log
echo "=== r5i queue done $(date +%H:%M:%S)"
