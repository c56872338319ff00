#!/bin/bash
# Round-4e QUEUE RUNNER: waits for campaign_r4d to exit, then executes
# lines from bench_logs/r4_queue.txt (NAME|BUDGET_S|SHELL_COMMAND, run
# from a synced worktree of main).  The queue file can be APPENDED TO at
# any time — the runner polls for new lines until the window closes, so
# TPU work can be scheduled without editing a running script (bash reads
# scripts incrementally; editing one mid-run corrupts it).
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r4e.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r4_tree
QUEUE=$REPO/bench_logs/r4_queue.txt
CURSOR=/tmp/r4_queue.cursor
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r4e.log
exec > >(tee -a "$LOG") 2>&1

say() { echo "=== $(date '+%F %T') $*"; }

if [ -f /tmp/campaign_r4d.pid ]; then
    P=$(cat /tmp/campaign_r4d.pid)
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
    say "r4d (pid $P) exited; starting r4e queue runner"
    sleep 60
fi

sync_tree() {
    if [ ! -d "$TREE" ]; then
        git -C "$REPO" worktree add --detach "$TREE" main >/dev/null
    fi
    local sha
    sha=$(git -C "$REPO" rev-parse main)
    git -C "$TREE" checkout --detach -f "$sha" >/dev/null 2>&1
    git -C "$TREE" clean -fdq 2>/dev/null
    say "tree synced to $(git -C "$TREE" rev-parse --short HEAD)"
}

END=${CAMPAIGN_END:-$(( $(date +%s) + 7200 ))}
say "campaign r4e: window $(( END - $(date +%s) ))s, queue $QUEUE"
export CUBEP3M_FINE_PROBE_FILE="$REPO/bench_cache/fine_pallas_probe.json"
[ -f "$CURSOR" ] || echo 0 > "$CURSOR"

while true; do
    REMAIN=$(( END - $(date +%s) ))
    if [ "$REMAIN" -le 600 ]; then
        say "window exhausted (${REMAIN}s left); exiting"
        break
    fi
    N=$(cat "$CURSOR")
    LINE=$(sed -n "$(( N + 1 ))p" "$QUEUE" 2>/dev/null || true)
    if [ -z "$LINE" ]; then
        sleep 60
        continue
    fi
    echo $(( N + 1 )) > "$CURSOR"
    case "$LINE" in \#*) continue ;; esac
    NAME=${LINE%%|*}
    REST=${LINE#*|}
    BUDGET=${REST%%|*}
    CMD=${REST#*|}
    if [ "$BUDGET" -gt $(( REMAIN - 360 )) ]; then
        BUDGET=$(( REMAIN - 360 ))
    fi
    sync_tree
    say "queue[$((N + 1))] $NAME (budget ${BUDGET}s): $CMD"
    t0=$SECONDS
    (cd "$TREE" && timeout "$BUDGET" bash -c "$CMD")
    rc=$?
    say "queue[$((N + 1))] $NAME: rc=$rc in $(( SECONDS - t0 ))s"
    if [ $rc -ne 0 ]; then
        say "$NAME failed; waiting 330s for TPU worker recovery"
        sleep 330
    else
        sleep 20
    fi
done

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign r4e done"
