#!/bin/bash
# Stop the TPU worker if the job queue has been idle for 45 minutes —
# the driver's end-of-round bench needs the device grant released even
# if the build session ends abruptly (see .claude/skills/verify).
IDLE_LIMIT=2700
BASE=/root/repo/scripts/jobs
while true; do
  sleep 300
  [ -f "$BASE/STOP" ] && exit 0
  # newest activity: any queue file, or the newest done/ output
  newest=$(ls -t "$BASE"/queue/*.py "$BASE"/done/*.out 2>/dev/null | head -1)
  [ -z "$newest" ] && continue
  if [ -n "$(ls "$BASE"/queue 2>/dev/null)" ]; then continue; fi
  age=$(( $(date +%s) - $(stat -c %Y "$newest") ))
  if [ "$age" -gt "$IDLE_LIMIT" ]; then
    echo "watchdog: queue idle ${age}s > ${IDLE_LIMIT}s; stopping worker"
    touch "$BASE/STOP"
    exit 0
  fi
done
