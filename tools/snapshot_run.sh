#!/bin/bash
# Run a tool against an immutable snapshot of the repo at HEAD.
#
# Long TPU runs import blues_tpu modules lazily mid-run; editing the live
# tree while one is in flight can corrupt it (CLAUDE.md). This script
# materializes `git archive HEAD` into .run_snapshot/ and launches the
# given command with PYTHONPATH pointing there (plus /root/.axon_site,
# which registers the axon TPU backend), so the live tree stays editable.
#
# Usage:
#   tools/snapshot_run.sh refresh          # rebuild .run_snapshot from HEAD
#   tools/snapshot_run.sh python tools/foo.py --args ...
set -euo pipefail
REPO=/root/repo
SNAP=$REPO/.run_snapshot

if [ "${1:-}" = "refresh" ]; then
    rm -rf "$SNAP"
    mkdir -p "$SNAP"
    git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
    git -C "$REPO" rev-parse HEAD > "$SNAP/.snapshot_rev"
    echo "snapshot at $(cat "$SNAP/.snapshot_rev")" >&2
    exit 0
fi

if [ ! -f "$SNAP/.snapshot_rev" ]; then
    echo "no snapshot; run: tools/snapshot_run.sh refresh" >&2
    exit 1
fi
echo "# running against snapshot $(cat "$SNAP/.snapshot_rev")" >&2
cd "$SNAP"
PYTHONPATH="$SNAP:/root/.axon_site" exec "$@"
