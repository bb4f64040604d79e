#!/bin/bash
for c in taa128 taa1 rowg taaloop taa256; do
  timeout 300 python /root/repo/experiments/probe3b.py $c 2>&1 | grep -v WARNING
  echo "--- $c done (rc=$?)"
done
