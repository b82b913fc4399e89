#!/bin/bash
# Restart the repl exec server without pattern-matching our own shell.
for pid in $(pgrep -f "tools/replser" ); do
    if [ "$pid" != "$$" ] && [ "$pid" != "$PPID" ]; then
        kill "$pid" 2>/dev/null
    fi
done
sleep 1
cd /root/repo
setsid nohup python tools/replserver.py > /tmp/replserver.log 2>&1 < /dev/null &
sleep 8
cat /tmp/replserver.log
