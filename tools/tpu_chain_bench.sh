#!/bin/bash
# Post-fixproof bench chain (round-3 outage recovery).
#
# The claim loop (/tmp/claimloop.sh) retries the wedged device and runs
# tools/tpu_r22_fixproof.py once on the first successful claim. This
# watcher waits for that run to finish, leaves the device quiet for 5
# minutes (CLAUDE.md rule 3 — fixproof exits via its own watchdog if the
# device flakes mid-run), then refreshes bench.py live so the round-end
# bench carries a post-outage, post-banked-fix cached fallback.
#
# Self-bounded: polls every 10 min for at most ~16h, never signals any
# device-holding process, and bench.py arms its own activity watchdog.
for a in $(seq 1 100); do
  if grep -q "fixproof rc=" /tmp/claimloop.log 2>/dev/null; then
    echo "fixproof done; quiet period, then bench ($(date +%T))" >> /tmp/chain.log
    sleep 300
    cd /root/repo && python bench.py > /tmp/bench_r9.log 2>&1
    echo "bench rc=$? at $(date +%T)" >> /tmp/chain.log
    exit 0
  fi
  sleep 600
done
echo "chain gave up at $(date +%T)" >> /tmp/chain.log
exit 1
