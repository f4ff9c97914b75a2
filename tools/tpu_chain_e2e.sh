#!/bin/bash
# Fourth link in the round-3 outage-recovery chain:
#   claimloop (fixproof) -> chain_bench (bench.py) -> chain_stream
#   (streamproof) -> THIS (tools/tpu_e2e.py: the 20-case on-chip CLI
#   matrix, revalidating the session's dispatch-gate changes on the
#   real chip).
#
# Waits for the stream link to record "streamproof rc=" in
# /tmp/chain2.log, leaves the device quiet for 5 minutes (CLAUDE.md
# rule 3), then runs the matrix once through tools/tpu_retry.sh (the
# stuck-at-claim watchdog; a plain `timeout` would SIGTERM mid-device
# work and wedge the tunnel — CLAUDE.md rule 2). Self-bounded: polls
# every 10 min for at most ~16h.
for a in $(seq 1 100); do
  if grep -q "streamproof rc=" /tmp/chain2.log 2>/dev/null; then
    echo "streamproof done; quiet period, then e2e matrix ($(date +%T))" >> /tmp/chain3.log
    sleep 300
    cd /root/repo && bash tools/tpu_retry.sh tools/tpu_e2e.py /tmp/e2e_r3c.log "scene ready" 3
    echo "e2e rc=$? at $(date +%T)" >> /tmp/chain3.log
    grep -cE "PASS" /tmp/e2e_r3c.log >> /tmp/chain3.log 2>/dev/null
    exit 0
  fi
  sleep 600
done
echo "e2e chain gave up at $(date +%T)" >> /tmp/chain3.log
exit 1
