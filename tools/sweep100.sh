#!/bin/bash
# Full-registry 100x sweep driver: runs tools/scale_probe.py over the
# batches in /tmp/batches.json sequentially (one Spark session per
# batch so an OOM in one batch cannot take down the rest), appending
# per-batch logs to /tmp/sweep100/batch_<i>.log.  Round-10 evidence
# completion: every registered bench query gets a measured 100x wall.
set -u
mkdir -p /tmp/sweep100
N=$(python -c "import json;print(len(json.load(open('/tmp/batches.json'))))")
for i in $(seq 0 $((N-1))); do
  if [ -s /tmp/sweep100/batch_$i.log ] && grep -q '^{' /tmp/sweep100/batch_$i.log; then
    echo "batch $i already done, skipping"
    continue
  fi
  QS=$(python -c "import json;print(','.join(json.load(open('/tmp/batches.json'))[$i]))")
  echo "=== batch $i: $QS"
  SCALE_PROBE_DRIVER_MEM=80g timeout 3600 python tools/scale_probe.py run "$QS" sf10 \
    > /tmp/sweep100/batch_$i.log 2>&1
  echo "batch $i exit: $?"
done
echo ALL_BATCHES_DONE
