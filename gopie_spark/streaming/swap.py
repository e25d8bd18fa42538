"""Crash-safe current-state swap shared by the foreachBatch state
holders (StreamingSketch, StreamingSessions).

The swap is two renames (current -> _old_<id>, tmp -> current); a kill
between them leaves no ``current`` but a complete ``_old_<id>``.
``recover`` heals that window on startup by restoring the newest
backup, so the committed-batch-id guard and carried state survive any
crash point:

- before rename 1: tmp (incomplete or complete) ignored, current intact;
- between renames: current missing, newest _old_ restored by recover();
- after rename 2, before cleanup: stale _old_ removed by the next swap
  or recover() (current exists, so backups are just deleted).
"""
from __future__ import annotations

import os
import re
import shutil

_OLD = re.compile(r"^_old_(\d+)$")


def recover(state_dir: str, current_name: str) -> None:
    """Restore ``<state_dir>/<current_name>`` from the newest
    ``_old_<batch_id>`` backup if a crash mid-swap removed it; delete
    stale backups otherwise."""
    current = os.path.join(state_dir, current_name)
    baks = []
    if os.path.isdir(state_dir):
        for name in os.listdir(state_dir):
            m = _OLD.match(name)
            if m:
                baks.append((int(m.group(1)), name))
    if not baks:
        return
    baks.sort()
    if not os.path.exists(current):
        os.rename(os.path.join(state_dir, baks[-1][1]), current)
        baks = baks[:-1]
    for _, name in baks:
        shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)


def swap_in(state_dir: str, current_name: str, tmp: str,
            batch_id: int) -> None:
    """tmp dir -> current, keeping the previous current as a backup
    until the new one is in place."""
    current = os.path.join(state_dir, current_name)
    bak = os.path.join(state_dir, f"_old_{batch_id}")
    if os.path.exists(current):
        os.rename(current, bak)
    os.rename(tmp, current)
    if os.path.exists(bak):
        shutil.rmtree(bak)
