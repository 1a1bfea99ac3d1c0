"""Bench-protocol guards (no Spark needed).

The r9 driver bench failed its own ratio gate (rc=1) and its inflated
warm times landed in ``bench_detail.json`` — which is also the
round-over-round regression baseline, so the NEXT healthy run would
have diffed against a poisoned base (spurious "improvements", masked
real regressions). Since r10 the diff baselines against
``bench_detail_last_green.json``, written only by zero-offender runs.
"""

from __future__ import annotations

import json

from bench import load_regression_baseline


def _w(path, warm):
    path.write_text(json.dumps({"warm_sec": warm}))


def test_baseline_prefers_last_green(tmp_path):
    green = tmp_path / "green.json"
    detail = tmp_path / "detail.json"
    _w(detail, {"q1": 9.0})
    # no green file yet (bootstrap): fall back to the last run's detail
    assert load_regression_baseline(str(green), str(detail)) == {"q1": 9.0}
    # green present: it wins even when detail holds a newer (failed) run
    _w(green, {"q1": 1.0})
    assert load_regression_baseline(str(green), str(detail)) == {"q1": 1.0}


def test_baseline_skips_unreadable_files(tmp_path):
    green = tmp_path / "green.json"
    detail = tmp_path / "detail.json"
    green.write_text("{not json")
    _w(detail, {"q2": 2.0})
    assert load_regression_baseline(str(green), str(detail)) == {"q2": 2.0}
    # neither readable → empty map (first-ever run)
    assert load_regression_baseline(str(tmp_path / "a"),
                                    str(tmp_path / "b")) == {}


def test_failed_run_never_writes_green_baseline():
    """The write-green decision is a named function: a run with any
    ratio offender must not replace the regression baseline."""
    import inspect

    import bench

    assert bench.is_green_run([]) is True
    assert bench.is_green_run(["q40_ngram_jaccard_pairs"]) is False
    # and main() must actually route the write through it
    assert "is_green_run(offenders)" in inspect.getsource(bench.main)
