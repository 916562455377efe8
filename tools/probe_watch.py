"""Round-long tenancy watcher (VERDICT.md r3 next-round #1).

The round-3 scaling campaign landed entirely inside one multi-hour
memory-bus-contended tenancy phase (all 24 legs probed 71-96 ms against
a healthy baseline of ~35-60 ms), so the ≥0.8 N→4N criterion could not
be measured on a healthy box. The verdict's prescription: keep an armed
watcher running for the WHOLE round — poll the single-core tenancy
probe every few minutes, fire the frozen scaling campaign the moment
the box reads healthy, and publish the continuous probe log either way.

Usage (run detached for the round):

    python tools/probe_watch.py [--interval 240] [--thresh 65]

State files (all under BENCH/; <r> = TS_ROUND, default r05):
  probe_log_<r>.jsonl   continuous probe log, one line per poll
  .watch_armed          arm the trigger; file content = force-fire
                        deadline (epoch seconds). Absent → log-only.
  .watch_hold           suppress firing while the operator runs heavy
                        foreground work (pytest, default bench) whose
                        own load would corrupt a campaign measurement.
  scaling_<r>_fire<k>.json / .log   campaign stdout/stderr per fire

Fire = the frozen two-pair campaign (`bench.py --scaling`,
TS_SCALE_NS=4,6) at TS_SCALE_REPEAT=3,1 — three repeats of the
criterion-bearing (4,16) pair, one of (6,24) for the span-attribution
table (a healthy tenancy window is scarce, and the hard criterion
lives on the headline pair; the r4 docstring said "2" while fire()
set "3,1" — ADVICE.md r4); every leg logs its own probes exactly as
in round 3. After a
fire whose headline efficiency is ≥ 0.8 the watcher disarms (the
criterion is met; further fires would only contend with the driver's
own benches). Otherwise it stays armed for one more healthy window,
bounded at 2 fires per round. If the deadline passes with no healthy
window, it force-fires once so the round still carries same-round
numbers under the (possibly contended) phase, probes attached.

Re-fire safety (code-review r5): every fire snapshots the published
evidence set (BASELINE.md, baseline_inputs.json, scaling_partial*.json)
immediately before launching, holds other armed watchers off via
BENCH/.watch_hold while the campaign runs, and restores the snapshot
if the new headline efficiency does not beat the already-published one
— the raw fire<k>.json/.log stay either way, so a worse contended
re-fire is recorded without regressing the published evidence (the
same adopt-if-better rule the store-refresh waiters declared).
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tools import holdfile  # noqa: E402
BENCH_DIR = os.path.join(REPO, "BENCH")
ROUND = os.environ.get("TS_ROUND", "r05")
LOG = os.path.join(BENCH_DIR, f"probe_log_{ROUND}.jsonl")
ARMED = os.path.join(BENCH_DIR, ".watch_armed")
HOLD = os.path.join(BENCH_DIR, ".watch_hold")
MAX_FIRES = 2


def log_line(**kw) -> None:
    kw["ts"] = datetime.datetime.now().isoformat(timespec="seconds")
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")


def deadline() -> float | None:
    try:
        with open(ARMED) as f:
            return float(f.read().strip() or "0") or None
    except (FileNotFoundError, ValueError):
        return None


# files bench.py --scaling rewrites at campaign end; a re-fire that
# measures WORSE than the already-published evidence restores these
# (keeping its raw fire<k>.json/.log as the no-silent-discard record)
PUBLISHED = ["BASELINE.md", "baseline_inputs.json",
             "scaling_partial.json", "scaling_partial_store.json"]


def _published_eff() -> float | None:
    """Headline efficiency currently published in baseline_inputs."""
    try:
        with open(os.path.join(BENCH_DIR, "baseline_inputs.json")) as f:
            camps = json.load(f).get("campaigns") or []
        return max(
            h["eff"] for c in camps if c.get("pair") == [4, 16]
            for h in c.get("history") or []
        )
    except (OSError, ValueError, KeyError):
        return None


def fire(k: int, probe_ms: float, forced: bool) -> dict:
    """Returns {"ran": bool, "result": dict | None}. ran=False means the
    fire was DEFERRED (a live hold appeared between the arming check and
    here — firing into another tool's held foreground load would burn a
    bounded fire slot on a junk run; code-review r5 session 14) and the
    caller must not count it against MAX_FIRES."""
    # hold other armed watchers off while the campaign runs: two
    # concurrent campaigns contention-corrupt each other. acquire() is
    # stale-aware (a dead creator's hold is cleaned, not honored) and
    # records our pid so a hard kill of THIS watcher cannot wedge the
    # fleet the way the old empty finally-removed file could.
    made_hold = holdfile.acquire(HOLD)
    if not made_hold and holdfile.hold_active(HOLD):
        log_line(event="campaign_deferred_hold", fire=k, probe_ms=probe_ms,
                 forced=forced)
        return {"ran": False, "result": None}
    out_json = os.path.join(BENCH_DIR, f"scaling_{ROUND}_fire{k}.json")
    out_log = os.path.join(BENCH_DIR, f"scaling_{ROUND}_fire{k}.log")
    env = dict(os.environ)
    # frozen protocol, time-boxed: 3 repeats of the criterion-bearing
    # (4,16) pair, 1 of (6,24) for the span-attribution table
    env.setdefault("TS_SCALE_REPEAT", "3,1")
    env.setdefault("TS_SCALE_NS", "4,6")
    # backups taken immediately BEFORE the fire (not at watcher start —
    # a startup snapshot would silently revert anything legitimately
    # published during the hours-long wait; code-review r5)
    prev_eff = _published_eff()
    bak = {}
    for n in PUBLISHED:
        p = os.path.join(BENCH_DIR, n)
        if os.path.exists(p):
            bak[n] = p + f".fire{k}.bak"
            shutil.copy(p, bak[n])
    log_line(event="campaign_start", fire=k, probe_ms=probe_ms, forced=forced)
    t0 = time.time()
    try:
        with open(out_json, "w") as jf, open(out_log, "w") as lf:
            rc = subprocess.call(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--scaling"],
                stdout=jf, stderr=lf, env=env, cwd=REPO,
            )
    finally:
        holdfile.release(HOLD, made_hold)
    result = None
    if rc == 0:
        try:
            with open(out_json) as f:
                result = json.loads(f.read().strip().splitlines()[-1])
        except (ValueError, IndexError):
            pass
    # keep-best gate (code-review r5): ADOPT only a clean, parseable
    # run that beats the published headline; everything else restores
    # the pre-fire snapshot. In particular (session-14 review): a
    # CRASHED campaign (rc != 0 / unparseable output) restores even
    # when the published eff could not be read (prev_eff None) —
    # bench.py persists partial campaign state as it goes, so a junk
    # run would otherwise replace the scaling_partial.json that
    # resume-mode waiters consume. The raw fire output above stays
    # committed either way, so the attempt is recorded, not silently
    # discarded (the adopt-if-better rule the store-refresh waiters
    # declared).
    new_eff = (result or {}).get("value")
    adopt = (
        rc == 0 and new_eff is not None
        and (prev_eff is None or new_eff > prev_eff)
    )
    restored = False
    if bak and not adopt:
        for n, b in bak.items():
            shutil.copy(b, os.path.join(BENCH_DIR, n))
        # published files the rejected campaign created ANEW (absent
        # pre-fire, so nothing to restore over them) must not survive
        # next to the restored set — a mixed-generation evidence set
        # reads as one campaign's output but isn't (session-14 review)
        for n in PUBLISHED:
            if n not in bak:
                try:
                    os.remove(os.path.join(BENCH_DIR, n))
                except OSError:
                    pass
        restored = True
    for b in bak.values():
        try:
            os.remove(b)
        except OSError:
            pass
    log_line(
        event="campaign_end", fire=k, rc=rc,
        wall_min=round((time.time() - t0) / 60, 1),
        eff=new_eff,
        prev_published_eff=prev_eff, restored_published=restored,
        probe_after_ms=None,
    )
    return {"ran": True, "result": result}


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: float) -> float:
        return float(args[args.index(name) + 1]) if name in args else default

    interval = opt("--interval", 240.0)
    thresh = opt("--thresh", 65.0)
    os.makedirs(BENCH_DIR, exist_ok=True)
    from bench import tenancy_probe

    # resume the fire counter from the evidence files on disk: a
    # restarted watcher starting at 0 would truncate-overwrite
    # scaling_<r>_fire1.json/.log (destroying the earlier fire's
    # published evidence) and could exceed the per-round fire bound
    import re

    fires = max(
        (
            int(m.group(1))
            for n in os.listdir(BENCH_DIR)
            for m in [re.match(rf"scaling_{ROUND}_fire(\d+)\.json$", n)]
            if m
        ),
        default=0,
    )
    log_line(event="watcher_start", interval=interval, thresh=thresh,
             fires=fires)
    while True:
        p = tenancy_probe()
        armed = os.path.exists(ARMED) and not holdfile.hold_active(HOLD)
        dl = deadline() if armed else None
        forced = dl is not None and time.time() >= dl
        log_line(probe_ms=p, armed=armed, fires=fires)
        if armed and fires < MAX_FIRES and (p < thresh or forced):
            # confirm with a second immediate probe — a single healthy
            # sample inside a contended phase would waste the round's
            # one good campaign slot (forced fires skip confirmation)
            p2 = tenancy_probe()
            log_line(probe_ms=p2, event="confirm", armed=True)
            if p2 < thresh or forced:
                outcome = fire(fires + 1, min(p, p2), forced)
                if outcome["ran"]:
                    # a hold-deferred fire does not consume a slot
                    fires += 1
                    result = outcome["result"]
                    if forced or (result is not None
                                  and (result.get("value") or 0) >= 0.8):
                        try:
                            os.remove(ARMED)
                        except FileNotFoundError:
                            pass
        time.sleep(interval)


if __name__ == "__main__":
    main()
