#!/bin/bash
# Round-3 scaling campaign, continued: sequential full --scaling runs
# (ABBA, 4->16, 8M docs), each line appended to BENCH_SCALING.jsonl.
cd /root/repo
N=${1:-5}
for i in $(seq 1 "$N"); do
  echo "=== run $i $(date -u +%H:%M:%S) ===" >> /tmp/scaling_campaign.log
  python bench.py --scaling 2>>/tmp/scaling_campaign.log | tail -1 >> BENCH_SCALING.jsonl
done
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> /tmp/scaling_campaign.log
