#!/bin/bash
# Chained to quiet_scaling_watch.sh: once the scaling-exec evidence run has
# finished (.scaling_run_state = DONE), wait for the next sustained quiet
# host window and run the full sf0.1 bench suite, refreshing
# .bench_last.json in a window worth committing.
set -u
cd "$(dirname "$0")/.."
FLAG=.scaling_run_state
LOG=.bench_watch.log
echo WAITING > .bench_run_state
steal_pct() {
  read -r _ a b c d e f g h _ < /proc/stat
  s0=$((h)); busy0=$((a+b+c+e+f+g))
  sleep "${1:-30}"
  read -r _ a b c d e f g h _ < /proc/stat
  s1=$((h)); busy1=$((a+b+c+e+f+g))
  python3 -c "print(round(100*($s1-$s0)/max(($busy1-$busy0)+($s1-$s0),1),2))"
}
# phase 1: wait for the scaling run to finish (or 4.5h hard stop)
deadline=$(( $(date +%s) + 16200 ))
while [ "$(cat "$FLAG" 2>/dev/null)" != "DONE" ]; do
  sleep 60
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "$(date +%H:%M:%S) deadline waiting for scaling DONE" >> "$LOG"
    break
  fi
done
echo "$(date +%H:%M:%S) scaling flag: $(cat "$FLAG" 2>/dev/null)" >> "$LOG"
# phase 2: wait for a quiet window (<2% steal twice), then bench
while true; do
  p=$(steal_pct 45)
  echo "$(date +%H:%M:%S) steal=$p" >> "$LOG"
  if python3 -c "exit(0 if $p < 2.0 else 1)"; then
    p2=$(steal_pct 20)
    if python3 -c "exit(0 if $p2 < 2.0 else 1)"; then break; fi
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "$(date +%H:%M:%S) deadline hit, benching anyway" >> "$LOG"; break
  fi
done
echo RUNNING > .bench_run_state
echo "$(date +%H:%M:%S) launching bench suite" >> "$LOG"
python bench.py >> "$LOG" 2>&1
echo DONE > .bench_run_state
echo "$(date +%H:%M:%S) finished" >> "$LOG"
