"""`bench.py --render-baseline` round-trip: BENCH/BASELINE.md is pure
formatting over the persisted campaign inputs (BENCH/baseline_inputs.json
plus the ladder / frontier-A/B artifacts). No Spark, no measurement — so
the render must be deterministic, and the committed BASELINE.md must be
exactly what a fresh render of the committed inputs produces. If either
test fails after an intentional renderer change, re-run
`python bench.py --render-baseline` and commit the result."""

import json
import os
import shutil

import pytest

import bench

ARTIFACTS = (
    "baseline_inputs.json",
    "scale_ladder_r05.json",
    "frontier_ab_r05.json",
    "store_refresh_r05_outcome.json",
    "submit_pair_r05.json",
)


def _tmp_repo(tmp_path):
    """Copy just the renderer's input artifacts into a scratch REPO so the
    render never touches the committed BENCH/BASELINE.md."""
    bench_dir = tmp_path / "BENCH"
    bench_dir.mkdir()
    for name in ARTIFACTS:
        src = os.path.join(bench.REPO, "BENCH", name)
        if os.path.exists(src):
            shutil.copy(src, bench_dir / name)
    return tmp_path


def _render(repo, monkeypatch, capsys):
    monkeypatch.setattr(bench, "REPO", str(repo))
    bench.render_baseline_from_artifacts()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rendered"] == "BENCH/BASELINE.md"
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "rb") as f:
        return f.read()


@pytest.fixture()
def inputs():
    path = os.path.join(bench.REPO, "BENCH", "baseline_inputs.json")
    if not os.path.exists(path):
        pytest.skip("no persisted campaign inputs yet")
    with open(path) as f:
        return json.load(f)


def test_render_is_deterministic(tmp_path, monkeypatch, capsys, inputs):
    repo = _tmp_repo(tmp_path)
    first = _render(repo, monkeypatch, capsys)
    second = _render(repo, monkeypatch, capsys)
    assert first == second
    text = first.decode()
    # Section invariants derived from the inputs file, not the renderer:
    # every campaign's efficiency figure and pair legs must appear.
    for c in inputs["campaigns"]:
        pair = tuple(c["pair"])
        assert f"| local[{pair[0]}] |" in text
        assert f"| local[{pair[1]}] |" in text
        assert f"{c['eff']:.3f}" in text
    if inputs.get("store_eff") is not None:
        assert f"{inputs['store_eff']:.3f}" in text


def test_adopted_refresh_record_renders_both_attempts():
    run = {"eff": 0.5, "urls_small": 100.0, "urls_big": 200.0,
           "probe_small_ms": [40.0, 41.0], "probe_big_ms": [42.0, 43.0],
           "identical": True}
    rejected = {"adopted": False, "probe_ms_at_fire": [67.1, 65.1],
                "published_store_eff": 0.426,
                "refresh_runs": [dict(run, eff=0.3)]}
    adopted = {"adopted": True, "refresh_runs": [run],
               "previous_rejected_attempt": rejected}
    import json as _json
    import bench as _b

    def section(rec, tmpdir):
        path = os.path.join(tmpdir, "BENCH")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "store_refresh_r05_outcome.json"),
                  "w") as f:
            _json.dump(rec, f)
        old = _b.REPO
        _b.REPO = tmpdir
        try:
            return "\n".join(_b._store_refresh_section())
        finally:
            _b.REPO = old

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        text = section(adopted, td)
    assert "adopted — shown above" in text
    assert "earlier attempt, not adopted" in text
    assert "BEATING" in text
    assert "force-fired under contention" in text
    assert "| 0.5 |" in text and "| 0.3 |" in text
    with tempfile.TemporaryDirectory() as td:
        text = section(rejected, td)
    assert "published, not adopted" in text
    assert "BEATING" not in text


def test_committed_baseline_matches_fresh_render(tmp_path, monkeypatch,
                                                 capsys, inputs):
    committed = os.path.join(bench.REPO, "BENCH", "BASELINE.md")
    if not os.path.exists(committed):
        pytest.skip("no committed BASELINE.md")
    with open(committed, "rb") as f:
        want = f.read()
    repo = _tmp_repo(tmp_path)
    got = _render(repo, monkeypatch, capsys)
    assert got == want, (
        "BENCH/BASELINE.md has drifted from the persisted inputs — "
        "re-run `python bench.py --render-baseline` and commit"
    )


def test_submit_pair_section_renders_and_is_absent_without_artifact():
    """The spark-submit PAIR section (tools/submit_pair.py artifact):
    rendered with efficiency, per-leg probes, and fp-match flags when
    the artifact exists; empty (not crashing) when it doesn't."""
    import bench as _b

    assert _b._submit_pair_section("/nonexistent/submit_pair.json") == []
    rec = {
        "eff": 0.77, "identical": True,
        "conditions": "Fired in a healthy window (two consecutive probes "
                      "[60.1, 59.2] ms at fire time).",
        "legs": {
            "4": {"urls_per_sec": 900.0, "probe_ms": [60.1, 61.0],
                  "fp_matches_in_process": True},
            "16": {"urls_per_sec": 2772.0, "probe_ms": [59.0, 62.0],
                   "fp_matches_in_process": True},
        },
    }
    import json as _json
    import tempfile
    fd, p = tempfile.mkstemp(suffix=".json")
    os.close(fd)
    try:
        with open(p, "w") as f:
            _json.dump(rec, f)
        text = "\n".join(_b._submit_pair_section(p))
    finally:
        os.unlink(p)
    assert "spark-submit scaling pair" in text
    assert "= **0.77**" in text
    assert "| local[4] | 900.0 |" in text
    assert "| local[16] | 2772.0 |" in text
    assert "healthy window" in text
    # legs table ordered numerically, not lexically ("16" < "4" as str)
    assert text.index("local[4]") < text.index("local[16]")
