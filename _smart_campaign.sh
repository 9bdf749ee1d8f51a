#!/bin/bash
# Probe-gated scaling campaign: only fire a --scaling run when the
# single-thread load probe says the machine is quiet (the round-3
# campaign showed efficiency tracks background load).
#
# Two-lock protocol (fixes the round-3 collision where the campaign's
# unconditional rm -f deleted the interactive session's lock):
#   /tmp/graft_ray.lock      — held by the INTERACTIVE session; the
#                              campaign never creates or removes it.
#   /tmp/graft_campaign.lock — held by the campaign DURING a bench run;
#                              the interactive session waits on it, and
#                              only the campaign removes it.
# Interactive recipe: touch /tmp/graft_ray.lock; wait until
# /tmp/graft_campaign.lock is gone; run Ray work; rm your lock.
cd /root/repo
N=${1:-6}            # quiet runs to collect
THRESH=${2:-0.082}   # median probe gate (idle nominal 0.070)
DEADLINE=$(( $(date +%s) + ${3:-14400} ))  # give up after 4h default
GAP=${4:-90}         # idle gap after each run (lets interactive work in)
done_runs=0
while [ "$done_runs" -lt "$N" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if [ -e /tmp/graft_ray.lock ]; then
    sleep 30; continue
  fi
  probe=$(python - <<'EOF'
import time, numpy as np
ts=[]
for _ in range(3):
    t0=time.time()
    x=np.arange(2_000_000,dtype=np.uint64)
    for _ in range(20): x=(x^(x>>np.uint64(13)))*np.uint64(0x100000001B3)
    int(x.sum()); ts.append(time.time()-t0)
print(round(sorted(ts)[1],4))
EOF
)
  ok=$(python -c "print(1 if $probe <= $THRESH else 0)")
  echo "$(date -u +%H:%M:%S) probe=$probe ok=$ok done=$done_runs" >> /tmp/smart_campaign.log
  if [ "$ok" = "1" ] && [ ! -e /tmp/graft_ray.lock ]; then
    touch /tmp/graft_campaign.lock
    python bench.py --scaling 2>>/tmp/smart_campaign.log | tail -1 >> BENCH_SCALING.jsonl
    rm -f /tmp/graft_campaign.lock
    done_runs=$((done_runs+1))
    echo "$(date -u +%H:%M:%S) RUN $done_runs recorded" >> /tmp/smart_campaign.log
    sleep "$GAP"
  else
    sleep 120
  fi
done
echo "SMART CAMPAIGN DONE $(date -u +%H:%M:%S) runs=$done_runs" >> /tmp/smart_campaign.log
