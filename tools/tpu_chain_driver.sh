#!/bin/bash
# Round-4 successor for the round-3 outage-recovery chain.
#
# The round-3 layout (see memory note round3-device-chain): a claim loop
# runs tools/tpu_r22_fixproof.py on the first successful device claim,
# then four watchers fire in sequence off log markers:
#   /tmp/claimloop.log "fixproof rc="  -> chain_bench   -> /tmp/chain.log  "bench rc="
#   /tmp/chain.log     "bench rc="     -> chain_stream  -> /tmp/chain2.log "streamproof rc="
#   /tmp/chain2.log    "streamproof rc=" -> chain_e2e   -> /tmp/chain3.log "e2e rc="
#   /tmp/chain3.log    "e2e rc="       -> chain_wc      -> /tmp/chain4.log "wc rc="
#
# This driver:
#  1. waits for the round-3 claim loop (pid in /tmp/claimloop.pid2, arg $1)
#     to exit, then — if fixproof never ran — keeps probing (CLAUDE.md
#     rule 9: self-bounded probe, never externally killed) and runs
#     fixproof itself on the first claim, writing the same marker so the
#     existing watchers fire;
#  2. backstops each downstream link: once a link's upstream marker
#     exists, if the link's own marker hasn't appeared and its watcher
#     pid is dead, runs the step here (same quiet periods, same logs).
#
# Never signals any device-holding process; every device step bounds
# itself via its own watchdog.

LOG=/tmp/chain_driver.log
say() { echo "[driver] $1 $(date +%T)" >> "$LOG"; }

OLD_LOOP_PID="${1:-27039}"

say "start; waiting for old claim loop pid=$OLD_LOOP_PID"
while kill -0 "$OLD_LOOP_PID" 2>/dev/null; do sleep 120; done
say "old claim loop exited"

# Phase 1: ensure fixproof runs.
if ! grep -q "fixproof rc=" /tmp/claimloop.log 2>/dev/null; then
  say "fixproof not yet run; starting probe loop"
  for a in $(seq 1 60); do
    say "probe $a"
    python /root/repo/tools/tpu_probe.py 600 > /tmp/probe_d.log 2>&1
    if grep -q CLAIM_OK /tmp/probe_d.log; then
      say "claim ok; launching fixproof"
      sleep 20
      python /root/repo/tools/tpu_r22_fixproof.py > /tmp/fixproof.log 2>&1
      rc=$?
      echo "=== fixproof rc=$rc at $(date +%T) ===" >> /tmp/claimloop.log
      say "fixproof rc=$rc"
      break
    fi
    sleep 540
  done
fi
if ! grep -q "fixproof rc=" /tmp/claimloop.log 2>/dev/null; then
  say "gave up waiting for a device claim; exiting"
  exit 1
fi

# Phase 2: backstop the four downstream links.
#   name  upstream_log  upstream_marker  own_log  own_marker  pidfile  cmd-string
backstop() {
  local name="$1" up_log="$2" up_mark="$3" own_log="$4" own_mark="$5" pidf="$6" cmd="$7"
  # Wait for upstream.
  while ! grep -q "$up_mark" "$up_log" 2>/dev/null; do sleep 300; done
  # Give the resident watcher its window (poll 600 + quiet 300 + run time).
  for a in $(seq 1 200); do
    grep -q "$own_mark" "$own_log" 2>/dev/null && { say "$name done by watcher"; return 0; }
    local wpid; wpid=$(cat "$pidf" 2>/dev/null)
    if [ -n "$wpid" ] && kill -0 "$wpid" 2>/dev/null; then
      sleep 300; continue
    fi
    # Watcher dead, marker absent: wait out a conservative in-flight window
    # (it may have died AFTER starting the step — step watchdogs are <=90m),
    # then run the step here.
    say "$name watcher dead; waiting out possible in-flight run"
    sleep 5700
    grep -q "$own_mark" "$own_log" 2>/dev/null && { say "$name landed late"; return 0; }
    say "$name backstop: running step"
    sleep 300
    ( cd /root/repo && bash -c "$cmd" )
    local rc=$?
    echo "$own_mark$rc at $(date +%T) [driver-backstop]" >> "$own_log"
    say "$name backstop rc=$rc"
    return 0
  done
}

backstop bench /tmp/claimloop.log "fixproof rc=" /tmp/chain.log "bench rc=" /tmp/chain.pid \
  'python bench.py > /tmp/bench_r9.log 2>&1'
backstop streamproof /tmp/chain.log "bench rc=" /tmp/chain2.log "streamproof rc=" /tmp/chain2.pid \
  'python tools/tpu_r23_streamproof.py > /tmp/streamproof.log 2>&1'
backstop e2e /tmp/chain2.log "streamproof rc=" /tmp/chain3.log "e2e rc=" /tmp/chain3.pid \
  'bash tools/tpu_retry.sh tools/tpu_e2e.py /tmp/e2e_r3c.log "scene ready" 3'
backstop wc /tmp/chain3.log "e2e rc=" /tmp/chain4.log "wc rc=" /tmp/chain4.pid \
  'python tools/tpu_r25_wc_sweep.py > /tmp/wc_sweep.log 2>&1'

say "all links accounted for; done"
