#!/bin/bash
# Sixth link in the outage-recovery chain (round 4):
#   ... -> chain_e2e (CLI matrix) -> chain_wc (wc sweep) -> THIS
#   (tools/tpu_hazards.py: the consolidated real-chip numeric-hazard
#   regression — MXU bf16 operand rounding, non-IEEE fdiv, FMA
#   contraction, DMA 4 GiB offset wrap — one claim, <5 min warm,
#   writes HAZARDS.json).
#
# Waits for the wc link to record "wc rc=" in /tmp/chain4.log, leaves
# the device quiet for 5 minutes (CLAUDE.md rule 3), then runs the
# hazard regression once. Self-bounded: polls every 10 min for at most
# ~16h; never signals any device-holding process; the tool arms its own
# 45-min watchdog.
for a in $(seq 1 100); do
  if grep -q "wc rc=" /tmp/chain4.log 2>/dev/null; then
    echo "wc done; quiet period, then hazards ($(date +%T))" >> /tmp/chain5.log
    sleep 300
    cd /root/repo && python tools/tpu_hazards.py > /tmp/hazards.log 2>&1
    echo "hazards rc=$? at $(date +%T)" >> /tmp/chain5.log
    exit 0
  fi
  sleep 600
done
echo "hazards chain gave up at $(date +%T)" >> /tmp/chain5.log
exit 1
