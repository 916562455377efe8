"""Shared BENCH/.watch_hold protocol (code-review r5 session 14).

A hold suppresses every armed evidence-firing tool while one tool runs
heavy foreground work whose load would corrupt a campaign measurement.
Previously the file was empty and lived only until its creator's
``finally`` block — a hard kill (OOM, kill -9) mid-campaign left it on
disk forever, and the made-hold guards (each tool removes only a hold
it created) meant NO tool would ever clean it up: the entire watcher
fleet wedged until a human deleted the file. (This actually happened:
a session crash left a stale hold that kept the store-refresh waiter
sleeping for hours.)

Holds now carry the creator's PID. A hold whose creator is dead is
stale: the first checker that notices removes it and reports the box
unheld. Legacy pid-less (empty) holds fall back to an mtime age bound
of 6 h — longer than any campaign this fleet runs.
"""

from __future__ import annotations

import os
import time

STALE_AGE_SEC = 6 * 3600


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def hold_active(path: str) -> bool:
    """True iff a LIVE hold exists. Stale holds are removed en route."""
    try:
        with open(path) as f:
            content = f.read().strip()
    except FileNotFoundError:
        return False
    except OSError:
        return True  # unreadable but present: assume held
    if content.isdigit():
        stale = not _pid_alive(int(content))
    else:
        try:
            stale = time.time() - os.path.getmtime(path) > STALE_AGE_SEC
        except OSError:
            return False  # vanished between open and stat
    if stale:
        try:
            os.remove(path)
        except OSError:
            pass
        return False
    return True


def acquire(path: str) -> bool:
    """Take the hold (writing our PID) unless a live one exists.
    Returns True iff WE created it — callers release only what they
    made, exactly the pre-existing made-hold discipline."""
    if hold_active(path):
        return False
    with open(path, "w") as f:
        f.write(str(os.getpid()))
    return True


def release(path: str, made: bool) -> None:
    if made:
        try:
            os.remove(path)
        except OSError:
            pass
