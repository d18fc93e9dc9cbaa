"""bench_report renders BENCH_RESULTS.json-shaped data into markdown."""

import json

from cuauv_vision_pipeline_tpu.misc.bench_report import main, render


RESULTS = [
    {
        "metric": "red_buoy_1080p_device_chain_fps_per_chip",
        "value": 74763.78,
        "unit": "frames/sec",
        "vs_baseline": 37.38,
        "lane": "batched_8",
    },
    {
        "metric": "yolo_p50_camera_to_detection_ms",
        "value": 320.0,
        "unit": "ms",
        "note": "tunnel RTT-dominated",
    },
    {"metric": "bus_roundtrip_720p_p50_ms", "value": 1.54, "unit": "ms"},
]


def test_targets_table_marks_met_and_missed():
    out = render(RESULTS)
    lines = out.splitlines()
    buoy = next(l for l in lines if l.startswith("| red_buoy_1080p"))
    yolo = next(
        l for l in lines if l.startswith("| yolo_p50") and "target" not in l
    )
    assert "| yes |" in buoy  # 74k >= 2000
    assert "| NO |" in yolo  # 320 ms not < 5 ms


def test_all_metrics_table_carries_context_fields():
    out = render(RESULTS)
    assert "lane=batched_8" in out
    assert "tunnel RTT-dominated" in out
    assert "(37.38x target)" in out
    # every input metric appears
    for r in RESULTS:
        assert r["metric"] in out


def test_main_reads_file_and_errors_cleanly(tmp_path, capsys):
    p = tmp_path / "r.json"
    p.write_text(json.dumps(RESULTS))
    assert main([str(p)]) == 0
    assert "# Benchmark report" in capsys.readouterr().out
    assert main([str(tmp_path / "missing.json")]) == 1
    # non-array payloads are rejected, not crashed on
    bad = tmp_path / "bad.json"
    bad.write_text('{"metric": "x"}')
    assert main([str(bad)]) == 1


def test_emit_merge_quick_never_displaces_full_pass(tmp_path, monkeypatch):
    """Across runs, a quick-pass line must not replace a full-pass row in
    BENCH_RESULTS.json (observed live: a later sweep's quick lines
    displaced the committed full-pass topology measurements); the full
    pass always overwrites, and quick lines still reach stdout/RESULTS."""
    import importlib
    import os
    import sys

    sys.modules.pop("bench", None)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))) )
    import bench

    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path)
    )
    path = tmp_path / "BENCH_RESULTS.json"
    path.write_text(json.dumps(
        [{"metric": "m1", "value": 50.0, "unit": "fps"}]  # full-pass row
    ))
    bench.RESULTS.clear()
    bench.QUICK = True
    try:
        bench.emit("m1", 2.0, "fps")   # quick must NOT displace
        bench.emit("m2", 7.0, "fps")   # quick with no full row: writes
    finally:
        bench.QUICK = False
    rows = {r["metric"]: r for r in json.loads(path.read_text())}
    assert rows["m1"]["value"] == 50.0 and "pass" not in rows["m1"]
    assert rows["m2"]["value"] == 7.0 and rows["m2"]["pass"] == "quick"
    # RESULTS (the in-run store feeding the stdout tail) keeps the quick
    # measurement for tail freshness
    assert {r["metric"]: r["value"] for r in bench.RESULTS}["m1"] == 2.0

    bench.RESULTS.clear()
    bench.emit("m1", 60.0, "fps")      # full pass overwrites
    rows = {r["metric"]: r for r in json.loads(path.read_text())}
    assert rows["m1"]["value"] == 60.0
    bench.RESULTS.clear()
