"""Hold-file protocol (tools/holdfile.py; session-14 review): a hold
whose creator died must go stale instead of wedging the watcher fleet
forever (each tool removes only holds it made, so nobody else would)."""

import os

from tools import holdfile


def _path(tmp_path):
    return str(tmp_path / ".watch_hold")


def test_acquire_release_roundtrip(tmp_path):
    p = _path(tmp_path)
    assert not holdfile.hold_active(p)
    assert holdfile.acquire(p)
    assert holdfile.hold_active(p)  # we are alive
    with open(p) as f:
        assert f.read().strip() == str(os.getpid())
    assert not holdfile.acquire(p)  # live hold: not re-acquirable
    holdfile.release(p, True)
    assert not holdfile.hold_active(p)


def test_dead_creator_hold_is_stale_and_cleaned(tmp_path):
    p = _path(tmp_path)
    with open(p, "w") as f:
        f.write("999999999")  # beyond pid_max: guaranteed dead
    assert not holdfile.hold_active(p)
    assert not os.path.exists(p)  # cleaned en route
    assert holdfile.acquire(p)  # and acquirable again
    holdfile.release(p, True)


def test_legacy_empty_hold_honored_until_age_bound(tmp_path):
    p = _path(tmp_path)
    open(p, "w").close()
    assert holdfile.hold_active(p)  # fresh pid-less hold: honored
    old = 7 * 3600
    st = os.stat(p)
    os.utime(p, (st.st_atime - old, st.st_mtime - old))
    assert not holdfile.hold_active(p)  # aged out: stale
    assert not os.path.exists(p)


def test_release_only_removes_what_we_made(tmp_path):
    p = _path(tmp_path)
    assert holdfile.acquire(p)
    holdfile.release(p, False)  # not ours to remove
    assert os.path.exists(p)
    holdfile.release(p, True)
    assert not os.path.exists(p)
