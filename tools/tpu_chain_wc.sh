#!/bin/bash
# Fifth link in the round-3 outage-recovery chain:
#   claimloop (fixproof) -> chain_bench (bench.py) -> chain_stream
#   (streamproof) -> chain_e2e (CLI matrix) -> THIS
#   (tools/tpu_r25_wc_sweep.py: worst-case two-level bc sweep + the
#   sort-slice global stage, on-chip bit-equality per variant).
#
# Waits for the e2e link to record "e2e rc=" in /tmp/chain3.log, leaves
# the device quiet for 5 minutes (CLAUDE.md rule 3), then runs the sweep
# once. The sweep self-watchdogs at 50 min (device-generated inputs, no
# uploads). Self-bounded: polls every 10 min for at most ~16h; never
# signals any device-holding process.
for a in $(seq 1 100); do
  if grep -q "e2e rc=" /tmp/chain3.log 2>/dev/null; then
    echo "e2e done; quiet period, then wc sweep ($(date +%T))" >> /tmp/chain4.log
    sleep 300
    cd /root/repo && python tools/tpu_r25_wc_sweep.py > /tmp/wc_sweep.log 2>&1
    echo "wc rc=$? at $(date +%T)" >> /tmp/chain4.log
    exit 0
  fi
  sleep 600
done
echo "wc chain gave up at $(date +%T)" >> /tmp/chain4.log
exit 1
