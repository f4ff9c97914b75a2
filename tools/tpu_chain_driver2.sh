#!/bin/bash
# Stage-2 successor for the round-4 outage-recovery chain.
#
# tools/tpu_chain_driver.sh (stage 1) gives up after 60 probes (~19 h of
# coverage) and backstops only the bench/stream/e2e/wc links. This stage:
#   1. waits for stage 1 (pid in /tmp/chain_driver.pid, overridable $1)
#      to exit;
#   2. if fixproof STILL hasn't run, keeps probing — 80 more probes,
#      ~25 h of extra coverage — and runs it on the first claim, writing
#      the same /tmp/claimloop.log marker the downstream watchers key on;
#   3. backstops ALL SIX downstream links, including the two stage 1
#      does not cover (hazards -> /tmp/chain5.log, serve_warm ->
#      /tmp/chain6.log), with the same dead-watcher / in-flight-window
#      protocol.
#
# Never signals any device-holding process (CLAUDE.md rule 9); every
# device step bounds itself via its own watchdog.

LOG=/tmp/chain_driver2.log
say() { echo "[driver2] $1 $(date +%T)" >> "$LOG"; }

STAGE1_PID="${1:-$(cat /tmp/chain_driver.pid 2>/dev/null)}"

if [ -n "$STAGE1_PID" ]; then
  say "start; waiting for stage-1 driver pid=$STAGE1_PID"
  while kill -0 "$STAGE1_PID" 2>/dev/null; do sleep 300; done
  say "stage-1 driver exited"
else
  # No pidfile: never probe concurrently with a possibly-live stage 1
  # (two claimants could launch device work at once — CLAUDE.md rule 2/3).
  # Wait for stage 1's own log to say it finished or gave up.
  say "start; no stage-1 pid — waiting on its log instead"
  while ! grep -qE "gave up|all links accounted" /tmp/chain_driver.log 2>/dev/null; do
    sleep 300
  done
  say "stage-1 log shows it finished"
fi

if ! grep -q "fixproof rc=" /tmp/claimloop.log 2>/dev/null; then
  say "fixproof still not run; starting stage-2 probe loop"
  for a in $(seq 1 80); do
    say "probe $a"
    python /root/repo/tools/tpu_probe.py 600 > /tmp/probe_d2.log 2>&1
    if grep -q CLAIM_OK /tmp/probe_d2.log; then
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

backstop() {
  local name="$1" up_log="$2" up_mark="$3" own_log="$4" own_mark="$5" pidf="$6" cmd="$7"
  while ! grep -q "$up_mark" "$up_log" 2>/dev/null; do sleep 300; done
  for a in $(seq 1 200); do
    grep -q "$own_mark" "$own_log" 2>/dev/null && { say "$name done by watcher"; return 0; }
    local wpid; wpid=$(cat "$pidf" 2>/dev/null)
    if [ -n "$wpid" ] && kill -0 "$wpid" 2>/dev/null; then
      sleep 300; continue
    fi
    say "$name watcher dead; waiting out possible in-flight run"
    sleep 5700
    grep -q "$own_mark" "$own_log" 2>/dev/null && { say "$name landed late"; return 0; }
    say "$name backstop: running step"
    sleep 300
    ( cd /root/repo && bash -c "$cmd" )
    local rc=$?
    echo "$own_mark$rc at $(date +%T) [driver2-backstop]" >> "$own_log"
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
backstop hazards /tmp/chain4.log "wc rc=" /tmp/chain5.log "hazards rc=" /tmp/chain5.pid \
  'python tools/tpu_hazards.py > /tmp/hazards.log 2>&1'
backstop serve_warm /tmp/chain5.log "hazards rc=" /tmp/chain6.log "serve rc=" /tmp/chain6.pid \
  'python tools/tpu_serve_warm.py > /tmp/serve_warm_r4.log 2>&1'

say "all links accounted for; done"
