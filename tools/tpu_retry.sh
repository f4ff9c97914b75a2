#!/bin/bash
# Watchdog runner for TPU scripts through the axon tunnel: device claims
# can hang indefinitely (see CLAUDE.md); this relaunches until the script
# prints its progress marker, then waits for completion.
# usage: tpu_retry.sh <script.py> <logfile> <progress_marker> [attempts]
SCRIPT=$1; LOG=$2; MARKER=$3; ATTEMPTS=${4:-4}
for a in $(seq 1 $ATTEMPTS); do
  echo "=== attempt $a $(date +%T) ===" >> "$LOG.meta"
  setsid python "$SCRIPT" > "$LOG" 2>&1 < /dev/null &
  PID=$!
  # wait up to 720s for the progress marker
  for i in $(seq 1 72); do
    sleep 10
    if grep -q "$MARKER" "$LOG" 2>/dev/null; then
      wait $PID
      echo "=== done attempt $a rc=$? ===" >> "$LOG.meta"
      exit 0
    fi
    kill -0 $PID 2>/dev/null || break
  done
  if kill -0 $PID 2>/dev/null; then
    echo "=== attempt $a stuck at claim; killing ===" >> "$LOG.meta"
    kill -9 $PID 2>/dev/null
    # stuck-at-claim processes never held the grant; short cooldown
    sleep 60
  else
    echo "=== attempt $a exited early rc ===" >> "$LOG.meta"
    grep -q Error "$LOG" && exit 1
    sleep 30
  fi
done
echo "=== all attempts failed ===" >> "$LOG.meta"
exit 1
