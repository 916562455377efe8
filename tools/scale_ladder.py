"""Data-scale ladder: same master (local[16]), same frozen synthetic-
fetch crawl, graph size swept 0.25x / 1x / 4x of the frozen scaling
graph. Evidence for the 10^10 trajectory: per-wave fixed floor
(scheduler + fsync) amortizes as waves grow, so fetched+deduped URLs/s
should hold or RISE with data size at fixed cores. Runs back-to-back so
all three legs share one tenancy phase; per-leg probes recorded.
Writes /tmp/ladder_<tag>.json per leg + /tmp/scale_ladder_summary.json.
"""
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)
from tools import holdfile  # noqa: E402

HOLD = os.path.join(REPO, "BENCH", ".watch_hold")
LOG = "/tmp/scale_ladder.log"

SIZES = [
    ("quarter", dict(TS_SCALE_DOMAINS="1250", TS_SCALE_PPD="100",
                     TS_SCALE_SEEDS="12500")),
    ("frozen1x", dict(TS_SCALE_DOMAINS="2500", TS_SCALE_PPD="200",
                      TS_SCALE_SEEDS="50000")),
    ("four_x", dict(TS_SCALE_DOMAINS="5000", TS_SCALE_PPD="400",
                    TS_SCALE_SEEDS="200000")),
]


def log(msg):
    with open(LOG, "a") as f:
        f.write(json.dumps(msg) + "\n")


# keep armed watchers quiet while we run — but only remove the hold if
# WE created it: unconditionally deleting it would release a hold the
# operator (or another tool) placed for their own foreground work,
# letting a watcher fire into that load (code-review r5; same
# made_hold guard as tools/frontier_ab.py)
made_hold = holdfile.acquire(HOLD)
summary = {}
try:
    for tag, knobs in SIZES:
        out = f"/tmp/ladder_{tag}.json"
        env = dict(os.environ)
        env.update(knobs)
        env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.1"
        t0 = time.time()
        log({"start": tag, "knobs": knobs, "ts": t0})
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--one", "16", out, "scaling"],
            cwd=REPO, env=env,
            stdout=open(f"/tmp/ladder_{tag}.stdout", "w"),
            stderr=open(f"/tmp/ladder_{tag}.stderr", "w"),
        )
        leg = {"rc": rc, "wall_outer": round(time.time() - t0, 1)}
        if rc == 0:
            with open(out) as f:
                leg.update(json.load(f))
            leg.pop("trace_fp", None)
        summary[tag] = leg
        log({"done": tag, **{k: leg.get(k) for k in
                             ("rc", "wall_sec", "fetched_total",
                              "urls_per_sec", "probe_ms")}})
        with open("/tmp/scale_ladder_summary.json", "w") as f:
            json.dump(summary, f, indent=1)
finally:
    holdfile.release(HOLD, made_hold)
log({"ladder_complete": True})
print(json.dumps(summary, indent=1))
