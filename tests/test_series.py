"""Semantic tests for the time-series registry + new corpus ops, on
crafted inputs with hand-computed expectations (the sf0.001 oracle
parity test covers these queries too; this file pins the *math*)."""

from __future__ import annotations

import datetime as dt

import pytest

import __spark_entry__ as entry

QS = entry.queries()


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [(i, t, u, et, float(v)) for (i, t, u, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _ts(h, m=0, s=0, day=1):
    return dt.datetime(2024, 1, day, h, m, s)


def test_time_weighted_avg_hand_computed(spark, tmp_path):
    # user 1: 10 held 10s, 20 held 30s -> (10*10 + 20*30) / 40 = 17.5
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, _ts(0, 0, 0), 1, "view", 10),
            (2, _ts(0, 0, 10), 1, "view", 20),
            (3, _ts(0, 0, 40), 1, "view", 0),
        ],
    )
    row = QS["time_weighted_avg"](spark, sf).collect()
    assert len(row) == 1
    assert row[0].tw_avg == pytest.approx(17.5)
    assert row[0].n_spans == 2


def test_wma_trailing_linear_weights(spark, tmp_path):
    # one event per hour -> hourly totals 1, 2, 3; at rn=3 weights are
    # 22, 23, 24 -> (22*1 + 23*2 + 24*3) / 69 = 140/69
    sf = _write_events(
        spark,
        tmp_path,
        [(h, _ts(h), 1, "view", h + 1) for h in range(3)],
    )
    rows = {r.h.hour: r.wma_24h for r in QS["wma_trailing"](spark, sf).collect()}
    assert rows[0] == pytest.approx(1.0)
    assert rows[1] == pytest.approx((23 * 1 + 24 * 2) / 47, abs=1e-6)
    assert rows[2] == pytest.approx(140 / 69, abs=1e-6)


def test_rolling_zscore_flags_spike_only(spark, tmp_path):
    # 24 calm hours (alternating 10/12), then a 100-spike: only the
    # spike clears |z| > 2 against its trailing-24h window.
    rows = [(h, _ts(h % 24, day=1 + h // 24), 1, "view", 10 + 2 * (h % 2)) for h in range(24)]
    rows.append((24, _ts(0, day=2), 1, "view", 100))
    sf = _write_events(spark, tmp_path, rows)
    out = QS["rolling_zscore_anomalies"](spark, sf).collect()
    assert len(out) == 1
    assert out[0].total == 100.0 and out[0].z > 2


def test_regr_trend_recovers_perfect_line(spark, tmp_path):
    # value = 2 * days_since_2024 + 5, sampled hourly -> exact fit
    rows = [
        (h, _ts(h % 24, day=1 + h // 24), 1, "view", 2 * (h / 24.0) + 5)
        for h in range(48)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = QS["regr_value_trend"](spark, sf).collect()[0]
    assert r.slope_per_day == pytest.approx(2.0, abs=1e-5)
    assert r.intercept == pytest.approx(5.0, abs=1e-5)
    assert r.r2 == pytest.approx(1.0, abs=1e-6)


def test_benford_digit_extraction(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 1, "O", 1.00), (2, 1, "O", 19.99), (3, 1, "O", 25.00), (4, 1, "O", 123.45)],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {r.digit: r for r in QS["benford_first_digit"](spark, str(tmp_path)).collect()}
    assert out[1].n == 3 and out[2].n == 1
    assert out[1].observed_p == pytest.approx(0.75)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_repetition_ratio_degenerate_doc(spark, tmp_path):
    # "x x x x x" -> 3 trigrams, 1 distinct -> ratio 1/3;
    # all-distinct doc -> ratio 1.0
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "x x x x x", "en", "web", 9),
            (2, "a b c d e", "en", "web", 9),
        ],
    )
    r = QS["repetition_ratio"](spark, sf).collect()[0]
    assert r.n_docs == 2
    assert r.min_distinct_ratio == pytest.approx(1 / 3, abs=1e-6)
    assert r.avg_distinct_ratio == pytest.approx((1 / 3 + 1.0) / 2, abs=1e-6)


def test_decontamination_flags_shared_shingle(spark, tmp_path):
    # doc 0 (benchmark: 0 % 97 == 0) shares its 5-gram with doc 1 but
    # not doc 2; doc 3 is too short to carry any 5-gram -> clean.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "alpha beta gamma delta epsilon", "en", "bench", 30),
            (1, "zz alpha beta gamma delta epsilon yy", "en", "web", 37),
            (2, "one two three four five six seven", "en", "web", 33),
            (3, "tiny doc", "en", "web", 8),
        ],
    )
    r = QS["decontamination_audit"](spark, sf).collect()
    by_src = {x.source: x for x in r}
    assert by_src["web"].n_docs == 3
    assert by_src["web"].n_contaminated == 1
    assert by_src["web"].contamination_rate == pytest.approx(1 / 3, abs=1e-6)
