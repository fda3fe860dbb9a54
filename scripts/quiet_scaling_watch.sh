#!/bin/bash
# Wait for a sustained quiet host window (low hypervisor steal), then run
# the multi-executor scaling evidence protocol (bench.py --scaling-exec).
# Writes RUNNING/DONE flags so an interactive session can avoid launching
# its own Spark work while the pinned children are being timed.
set -u
cd "$(dirname "$0")/.."
FLAG=.scaling_run_state
LOG=.scaling_watch.log
echo WAITING > "$FLAG"
steal_pct() {
  read -r _ a b c d e f g h _ < /proc/stat
  s0=$((h)); busy0=$((a+b+c+e+f+g))
  sleep "${1:-30}"
  read -r _ a b c d e f g h _ < /proc/stat
  s1=$((h)); busy1=$((a+b+c+e+f+g))
  python3 -c "print(round(100*($s1-$s0)/max(($busy1-$busy0)+($s1-$s0),1),2))"
}
deadline=$(( $(date +%s) + 14400 ))   # start anyway after 4h of waiting
while true; do
  p=$(steal_pct 60)
  echo "$(date +%H:%M:%S) steal=$p" >> "$LOG"
  if python3 -c "exit(0 if $p < 1.0 else 1)"; then
    p2=$(steal_pct 30)
    echo "$(date +%H:%M:%S) confirm steal=$p2" >> "$LOG"
    if python3 -c "exit(0 if $p2 < 1.0 else 1)"; then break; fi
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "$(date +%H:%M:%S) deadline hit, starting anyway" >> "$LOG"; break
  fi
done
echo RUNNING > "$FLAG"
echo "$(date +%H:%M:%S) launching --scaling-exec" >> "$LOG"
python bench.py --scaling-exec 400000 3 2 4 >> "$LOG" 2>&1
echo DONE > "$FLAG"
echo "$(date +%H:%M:%S) finished" >> "$LOG"
