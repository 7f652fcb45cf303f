"""bench.py driver-safety contract: phase gating + headline emission.

The driver wraps ``python bench.py`` in a hard timeout and parses the
LAST JSON line of stdout; rc!=0 or a kill mid-metric voids the round's
bench record. These tests pin the two mechanisms that keep the record
green on a slow relay: the per-phase worst-case budget gate (skip, don't
die) and the headline record being re-printed as the final line.
"""

import json
import time

import pytest

import bench


@pytest.mark.smoke
def test_fits_gate_passes_and_skips(capsys):
    t0 = bench._BENCH_T0
    try:
        bench._BENCH_T0 = time.monotonic()  # elapsed ~ 0
        assert bench._fits(100, 50, "phase-a") is True
        assert bench._fits(40, 50, "phase-b") is False
        err = capsys.readouterr().err
        assert "skipping phase-b" in err
        assert "phase-a" not in err  # passing phases are silent
    finally:
        bench._BENCH_T0 = t0


@pytest.mark.smoke
def test_fits_gate_accounts_elapsed(capsys):
    t0 = bench._BENCH_T0
    try:
        bench._BENCH_T0 = time.monotonic() - 300  # 300s already spent
        assert bench._fits(1140, 400, "x") is True   # 300+400 < 1140
        assert bench._fits(600, 400, "x") is False   # 300+400 > 600
    finally:
        bench._BENCH_T0 = t0


@pytest.mark.smoke
def test_emit_records_headline_and_reprints(capsys):
    saved = dict(bench._HEADLINE)
    bench._HEADLINE.clear()
    try:
        bench._emit("metric_one", 1.0, "u", None, "float32")
        bench._emit("metric_two", 2.0, "u", None, "float32")
        assert bench._HEADLINE["metric"] == "metric_one"
        out = capsys.readouterr().out.strip().splitlines()
        assert [json.loads(l)["metric"] for l in out] == [
            "metric_one", "metric_two"]
        # main()'s final re-print guarantees the headline is the last line
        print(json.dumps(bench._HEADLINE), flush=True)
        last = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(last)["metric"] == "metric_one"
    finally:
        bench._HEADLINE.clear()
        bench._HEADLINE.update(saved)
