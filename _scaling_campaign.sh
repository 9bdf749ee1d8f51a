#!/bin/bash
# Round-3 scaling campaign: 6 sequential full --scaling runs (ABBA, 4->16).
cd /root/repo
for i in 3 4 5 6; do
  echo "=== run $i $(date -u +%H:%M:%S) ===" >> /tmp/scaling_campaign.log
  python bench.py --scaling 2>>/tmp/scaling_campaign.log | tail -1 >> BENCH_SCALING.jsonl
done
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> /tmp/scaling_campaign.log
