#!/bin/bash
# Third link in the round-3 outage-recovery chain:
#   claimloop (fixproof on first claim) -> tpu_chain_bench.sh (bench.py)
#   -> THIS (tpu_r23_streamproof.py: beyond-HBM host-streamed scorer).
#
# Waits for the bench link to record "bench rc=" in /tmp/chain.log,
# leaves the device quiet for 5 minutes (CLAUDE.md rule 3), then runs
# the streamed-scorer proof once. Self-bounded: polls every 10 min for
# at most ~16h, never signals any device-holding process; streamproof
# arms its own 90-min watchdog.
for a in $(seq 1 100); do
  if grep -q "bench rc=" /tmp/chain.log 2>/dev/null; then
    echo "bench done; quiet period, then streamproof ($(date +%T))" >> /tmp/chain2.log
    sleep 300
    cd /root/repo && python tools/tpu_r23_streamproof.py > /tmp/streamproof.log 2>&1
    echo "streamproof rc=$? at $(date +%T)" >> /tmp/chain2.log
    exit 0
  fi
  sleep 600
done
echo "stream chain gave up at $(date +%T)" >> /tmp/chain2.log
exit 1
