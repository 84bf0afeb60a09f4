"""The bench headline must survive the driver's bounded tail capture.

Round 4 regression: the per-sample probe log was embedded in the headline
JSON line, the line outgrew the driver's stdout tail window, and the driver
captured it mid-JSON -> BENCH_r04.json {"parsed": null}. These tests pin the
fix: the probe log + bulky per-section detail go to a side file + their own
stdout line, the headline is the FINAL line and stays under
HEADLINE_BUDGET (< the ~2000-char driver tail), and a truncated-tail
replica of the driver's capture still json-parses. Oversized extras are
spilled to the detail channel rather than breaking the budget.
"""

import contextlib
import io
import json

from bench import HEADLINE_BUDGET, emit_headline

#: replica of the round-4 probe volume: 15 queries x 5 samples with pre+post
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
    for i in range(15)
}

#: round-5-shaped side-channel detail: full compaction records incl. the
#: three-base Zipf trend — must never ride on the headline line
_DETAIL = {
    "compaction": {
        "incoming_docs": 15000, "ingest_sec": 7.3, "compact_sec": 14.4,
        "compact_stage_sec": {"stats": 2.9, "postings": 7.0,
                              "term_stats": 2.5},
        "incremental": True, "rebuild_sec": 13.3,
        "compact_over_rebuild": 1.083,
        "probe_pre": {"busy_cores": 1.0, "memcpy_gbps": 3.2, "clean": False},
        "probe_post": {"busy_cores": 1.0, "memcpy_gbps": 4.4, "clean": True},
    },
    "compaction_monotone_zipf": {
        "runs": [
            {"base_docs": b, "incoming_docs": 15000,
             "vocab": "zipf-tail 2M terms, s=1.1",
             "doc_id_mode": "monotone", "ingest_sec": 5.0,
             "compact_sec": 19.0,
             "compact_stage_sec": {"stats": 3.4, "postings": 9.0,
                                   "term_stats": 3.7},
             "incremental": True, "rebuild_sec": 16.0,
             "compact_over_rebuild": 1.18,
             "probe_pre": {"busy_cores": 1.0, "memcpy_gbps": 5.8,
                           "clean": True},
             "probe_post": {"busy_cores": 1.0, "memcpy_gbps": 5.3,
                            "clean": True}}
            for b in (150000, 300000, 600000)
        ],
    },
}

_PAYLOAD = {
    "metric": "headline_total",
    "value": 28.042,
    "unit": "sec",
    "queries": {f"query_{i:02d}": 1.234 for i in range(15)},
    "sf": 0.1,
    "extra": {
        "loadavg_start": 1.27,
        "index_docs_per_sec": 13093.9,
        "index_n_docs": 149755,
        "index_stats_sec": 1.2,
        "index_postings_sec": 4.1,
        "index_term_stats_sec": 2.2,
        "bm25_ms_per_query": 51.4,
        "bm25_result_rows": 230,
        "oracle_single_node_docs_per_sec": 5229.8,
        "speedup_vs_reference_single_node": 2.5,
        "compaction": {"compact_over_rebuild": 1.083, "clean": True},
        "compaction_monotone_zipf": {
            "ratio_by_base": {"150000": 1.18, "300000": 0.698,
                              "600000": 0.338},
            "compact_sec_growth_4x_base": 1.327,
            "rebuild_sec_growth_4x_base": 4.641,
            "clean": True,
        },
        "regressions": {"query_04": {"prev": 1.4, "now": 1.692}},
        "regression_count": 1,
        "loadavg_end": 14.77,
    },
    "cpus": 32,
}


def _run_emit(tmp_path, payload=None, detail=None):
    buf = io.StringIO()
    probe_path = str(tmp_path / "bench_probes.json")
    with contextlib.redirect_stdout(buf):
        emit_headline(
            json.loads(json.dumps(payload or _PAYLOAD)), _BIG_PROBE_LOG,
            detail=json.loads(json.dumps(detail or _DETAIL)),
            probe_path=probe_path,
        )
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
        assert parsed["value"] == 28.042
        assert parsed["queries"]["query_00"] == 1.234


def test_headline_line_is_compact_and_final(tmp_path):
    out, _ = _run_emit(tmp_path)
    lines = out.strip().splitlines()
    last = lines[-1]
    assert len(last) < HEADLINE_BUDGET
    # probe samples and full compaction records live on their own earlier
    # line, never in the headline
    assert '"samples":' not in last
    assert '"runs":' not in last
    parsed = json.loads(last)
    # compact per-query clean-counts survive in the headline for the gate
    assert parsed["extra"]["clean_samples"]["query_00"] == 1
    # the compaction SUMMARIES survive in the headline
    assert parsed["extra"]["compaction"]["compact_over_rebuild"] == 1.083
    zipf = parsed["extra"]["compaction_monotone_zipf"]
    assert zipf["ratio_by_base"]["600000"] == 0.338


def test_probe_side_file_holds_full_log_and_detail(tmp_path):
    _, probe_path = _run_emit(tmp_path)
    with open(probe_path) as f:
        side = json.load(f)
    assert side["probes"] == _BIG_PROBE_LOG
    assert side["detail"]["compaction_monotone_zipf"]["runs"][2][
        "base_docs"] == 600000


def test_provisional_then_final_headline(tmp_path):
    # crash insurance: a provisional headline is emitted before the long
    # compaction tail; on a healthy run the FINAL emit is the tail's last
    # line, and if the process dies mid-tail the provisional line is the
    # last complete one — both must parse
    buf = io.StringIO()
    probe_path = str(tmp_path / "bench_probes.json")
    prov = json.loads(json.dumps(_PAYLOAD))
    prov["extra"]["provisional"] = True
    with contextlib.redirect_stdout(buf):
        emit_headline(prov, _BIG_PROBE_LOG, probe_path=probe_path)
    killed_tail = buf.getvalue()[-2000:]
    parsed = json.loads(killed_tail.strip().splitlines()[-1])
    assert parsed["extra"]["provisional"] is True
    with contextlib.redirect_stdout(buf):
        emit_headline(json.loads(json.dumps(_PAYLOAD)), _BIG_PROBE_LOG,
                      detail=_DETAIL, probe_path=probe_path)
    healthy_tail = buf.getvalue()[-2000:]
    parsed = json.loads(healthy_tail.strip().splitlines()[-1])
    assert "provisional" not in parsed["extra"]
    assert parsed["extra"]["compaction_monotone_zipf"]["ratio_by_base"]


def test_oversized_extras_spill_to_detail(tmp_path):
    payload = json.loads(json.dumps(_PAYLOAD))
    # a pathological extra (e.g. a future section forgetting the summary
    # pattern) must spill to the side channel, not break the budget
    payload["extra"]["huge_section"] = {
        f"k{i}": "x" * 50 for i in range(100)
    }
    out, probe_path = _run_emit(tmp_path, payload=payload)
    last = out.strip().splitlines()[-1]
    assert len(last) < HEADLINE_BUDGET
    parsed = json.loads(last)
    assert "huge_section" not in parsed["extra"]
    with open(probe_path) as f:
        side = json.load(f)
    assert side["detail"]["extra.huge_section"]["k0"] == "x" * 50


def test_regression_claims_require_clean_evidence():
    from bench import classify_regressions

    timings = {"q_dirty": 2.0, "q_clean": 2.0, "q_fine": 1.0}
    prev = {"q_dirty": 1.0, "q_clean": 1.0, "q_fine": 1.0}
    probe_log = {
        # every sample contended: exceedance is window noise, not a claim
        "q_dirty": {"clean_samples": 0, "n_samples": 5},
        # >=1 clean sample exceeded the bar: a real regression claim
        "q_clean": {"clean_samples": 2, "n_samples": 3},
        "q_fine": {"clean_samples": 3, "n_samples": 3},
    }
    regressions, unprobed = classify_regressions(timings, prev, probe_log)
    assert regressions == {"q_clean": {"prev": 1.0, "now": 2.0}}
    assert unprobed == {"q_dirty": {"prev": 1.0, "now": 2.0}}
    # a query missing from the probe log (defensive) counts as unprobed
    regressions2, unprobed2 = classify_regressions(
        {"q_x": 2.0}, {"q_x": 1.0}, {})
    assert regressions2 == {} and "q_x" in unprobed2
