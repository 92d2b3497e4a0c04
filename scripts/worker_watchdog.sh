#!/bin/bash
# Detached safety net for scripts/tpu_worker.py: if the job queue stays
# empty and nothing lands in done/ for 45 minutes, drop the STOP file so
# the worker exits cleanly and releases the device grant (the driver's
# end-of-round bench needs the chip free; an abrupt session end must not
# leave the grant held). See .claude/skills/verify.
BASE=/root/repo/scripts/jobs
IDLE_LIMIT=$((45 * 60))
while true; do
  sleep 300
  [ -e "$BASE/STOP" ] && exit 0
  if [ -n "$(ls -A "$BASE/queue" 2>/dev/null)" ]; then continue; fi
  last=$(ls -t "$BASE/done" 2>/dev/null | head -1)
  [ -z "$last" ] && continue
  age=$(( $(date +%s) - $(stat -c %Y "$BASE/done/$last") ))
  if [ "$age" -ge "$IDLE_LIMIT" ]; then
    touch "$BASE/STOP"
    echo "watchdog: idle ${age}s, STOP dropped $(date)" >> "$BASE/watchdog.log"
    exit 0
  fi
done
