#!/bin/bash
# Seventh link in the outage-recovery chain (round 4):
#   ... -> chain_wc (wc sweep) -> chain_hazards -> THIS
#   (tools/tpu_serve_warm.py: serve warm-path latency, now including the
#   LUT-cache ON/OFF delta — the per-request 16.7M-lattice rebuild the
#   round-4 cache removes from every warm mode-1 request).
#
# Waits for the hazards link to record "hazards rc=" in /tmp/chain5.log,
# leaves the device quiet for 5 minutes (CLAUDE.md rule 3), then runs the
# measurement once. Self-bounded: polls every 10 min for at most ~16h;
# never signals any device-holding process.
for a in $(seq 1 100); do
  if grep -q "hazards rc=" /tmp/chain5.log 2>/dev/null; then
    echo "hazards done; quiet period, then serve warm ($(date +%T))" >> /tmp/chain6.log
    sleep 300
    # no external timeout: the tool arms its own 60-min watchdog
    # (an external SIGTERM mid-device-work wedges the tunnel, rule 2)
    cd /root/repo && python tools/tpu_serve_warm.py > /tmp/serve_warm_r4.log 2>&1
    echo "serve rc=$? at $(date +%T)" >> /tmp/chain6.log
    exit 0
  fi
  sleep 600
done
echo "serve chain gave up at $(date +%T)" >> /tmp/chain6.log
exit 1
