"""The bench headline must survive the driver's bounded tail capture.

Round 4 regression: the per-sample probe log was embedded in the headline
JSON line, the line outgrew the driver's stdout tail window, and the driver
captured it mid-JSON -> BENCH_r04.json {"parsed": null}. These tests pin the
fix: the probe log goes to a side file + its own stdout line, the headline
is the FINAL line and stays compact, and a truncated-tail replica of the
driver's capture still json-parses.
"""

import contextlib
import io
import json

from bench import emit_headline

#: replica of the round-4 probe volume: 14 queries x 5 samples with pre+post
#: probe readings each — the payload that broke the r4 headline
_BIG_PROBE_LOG = {
    f"query_{i:02d}": {
        "clean_samples": 1,
        "n_samples": 5,
        "samples": [
            {"sec": 1.234, "clean": False,
             "busy_cores": [1.34, 2.91], "memcpy_gbps": [2.31, 1.63]}
            for _ in range(5)
        ],
    }
    for i in range(14)
}

_PAYLOAD = {
    "metric": "headline_total",
    "value": 42.39,
    "unit": "sec",
    "queries": {f"query_{i:02d}": 1.234 for i in range(14)},
    "sf": 0.1,
    "extra": {
        "index_docs_per_sec": 12700.0,
        "oracle_single_node_docs_per_sec": 5200.0,
        "speedup_vs_reference_single_node": 2.43,
        "compaction": {"compact_sec": 14.9, "rebuild_sec": 13.8,
                       "compact_over_rebuild": 1.08,
                       "probe_pre": {"busy_cores": 1.1, "memcpy_gbps": 4.6,
                                     "clean": True},
                       "probe_post": {"busy_cores": 1.2, "memcpy_gbps": 4.5,
                                      "clean": True}},
        "regressions": {},
        "regression_count": 0,
    },
    "cpus": 32,
}


def _run_emit(tmp_path):
    buf = io.StringIO()
    probe_path = str(tmp_path / "bench_probes.json")
    with contextlib.redirect_stdout(buf):
        emit_headline(dict(_PAYLOAD), _BIG_PROBE_LOG, probe_path=probe_path)
    return buf.getvalue(), probe_path


def test_last_line_parses_from_truncated_tail(tmp_path):
    out, _ = _run_emit(tmp_path)
    # driver-style capture: keep only a bounded tail of stdout, then parse
    # the last line — must succeed even when the tail cut lands mid probe-log
    for tail_chars in (2000, 4000, 8000):
        tail = out[-tail_chars:]
        last = tail.strip().splitlines()[-1]
        parsed = json.loads(last)
        assert parsed["metric"] == "headline_total"
        assert parsed["value"] == 42.39
        assert parsed["queries"]["query_00"] == 1.234


def test_headline_line_is_compact_and_final(tmp_path):
    out, _ = _run_emit(tmp_path)
    lines = out.strip().splitlines()
    last = lines[-1]
    assert len(last) < 4000
    # probe samples live on their own earlier line, never in the headline
    assert '"samples":' not in last
    parsed = json.loads(last)
    # compact per-query clean-counts survive in the headline for the gate
    assert parsed["extra"]["clean_samples"]["query_00"] == 1


def test_probe_side_file_holds_full_log(tmp_path):
    _, probe_path = _run_emit(tmp_path)
    with open(probe_path) as f:
        log = json.load(f)
    assert log == _BIG_PROBE_LOG
