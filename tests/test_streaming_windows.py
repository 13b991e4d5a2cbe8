"""Watermarked windowed aggs + applyInPandasWithState sessionization.

Micro-batch boundaries are forced explicitly: the query starts first,
then each batch is written and drained with processAllAvailable() —
file-listing order is not relied on.
"""

from datetime import datetime

from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.streaming.windows import (
    sessionize_stream,
    windowed_event_counts,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ts(h, m=0):
    return datetime(2026, 1, 1, h, m)


def _feed(spark, q, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)
    q.processAllAvailable()


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    src = str(tmp_path / "ev")
    # the source dir must exist with a schema-bearing file before start
    spark.createDataFrame([], SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = windowed_event_counts(stream, "1 hour", "30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .start()
    )
    try:
        # batch 1: two events in the 10:00 window, one in 11:00
        _feed(spark, q, src, [
            (1, _ts(10, 5), 1, "click", 1.0),
            (2, _ts(10, 40), 1, "click", 2.0),
            (3, _ts(11, 10), 1, "view", 1.0),
        ])
        # batch 2: fencepost at 14:00 -> watermark becomes 13:30 after
        # this batch; the 10:00/11:00 windows finalize next batch
        _feed(spark, q, src, [
            (4, _ts(14, 0), 1, "view", 1.0),
        ])
        # batch 3: both rows are behind the 13:30 watermark and must be
        # DROPPED (their windows are final; no double counting)
        _feed(spark, q, src, [
            (5, _ts(9, 30), 1, "click", 100.0),
            (6, _ts(10, 50), 1, "click", 100.0),
        ])
    finally:
        q.stop()
    rows = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    assert rows == {
        (10, "click"): (2, 3.0),
        (11, "view"): (1, 1.0),
    }


def test_sessionize_stream_matches_batch_semantics(spark, tmp_path):
    src = str(tmp_path / "sess")
    spark.createDataFrame([], SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sess = sessionize_stream(stream, gap_minutes=30)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    try:
        # user 1: 12:00, 12:10 (one session) then 13:30 (gap > 30 min ->
        # new session); user 2: single event
        _feed(spark, q, src, [
            (1, _ts(12, 0), 1, "a", 1.0),
            (2, _ts(12, 10), 1, "a", 1.0),
            (3, _ts(12, 5), 2, "a", 1.0),
        ])
        _feed(spark, q, src, [
            (4, _ts(13, 30), 1, "a", 1.0),
        ])
        # fenceposts: a batch runs with the watermark computed from the
        # PREVIOUS batch, so two advancing fenceposts flush users 1/2
        # via event-time timeout (the fencepost users' own open
        # sessions are not asserted on)
        _feed(spark, q, src, [
            (5, _ts(20, 0), 9, "a", 1.0),
        ])
        _feed(spark, q, src, [
            (6, datetime(2026, 1, 2, 5, 0), 8, "a", 1.0),
        ])
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    }
    assert (1, _ts(12, 0), _ts(12, 10), 2) in got
    assert (1, _ts(13, 30), _ts(13, 30), 1) in got
    assert (2, _ts(12, 5), _ts(12, 5), 1) in got
    # session COUNTS for the flushed users equal the batch operator's
    all_events = spark.read.parquet(src).filter(F.col("user_id").isin(1, 2))
    w_counts = {}
    for r in all_events.collect():
        w_counts.setdefault(r["user_id"], []).append(r["ts"])
    for uid, tss in w_counts.items():
        tss.sort()
        n_sessions = 1 + sum(
            1 for a, b in zip(tss, tss[1:]) if (b - a).total_seconds() > 1800
        )
        assert sum(1 for g in got if g[0] == uid) == n_sessions, uid


def test_sessionize_late_event_extends_session_start(spark, tmp_path):
    """An out-of-order event inside the watermark that PRECEDES the open
    session's start must pull session_start back (r2 advice) — matching
    the batch semantics where events are globally time-sorted."""
    src = str(tmp_path / "late")
    spark.createDataFrame([], SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sess = sessionize_stream(stream, gap_minutes=30, watermark="2 hours")
    q = (
        sess.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .start()
    )
    try:
        _feed(spark, q, src, [(1, _ts(12, 10), 1, "a", 1.0)])
        # late but within the 2h watermark, within gap of 12:10
        _feed(spark, q, src, [(2, _ts(12, 0), 1, "a", 1.0)])
        # fenceposts advance the watermark past 12:10 + gap to flush
        _feed(spark, q, src, [(3, _ts(20, 0), 9, "a", 1.0)])
        _feed(spark, q, src, [(4, datetime(2026, 1, 2, 5, 0), 8, "a", 1.0)])
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from late_sessions").collect()
    }
    assert (1, _ts(12, 0), _ts(12, 10), 2) in got, got


def test_sessionize_far_late_event_is_own_session(spark, tmp_path):
    """A within-watermark late event more than gap EARLIER than the open
    session's start must close as its OWN session, not be absorbed with
    session_start yanked back (round-3 ADVICE). A chain of late events
    that bridges up to the open session, however, merges — batch
    semantics gap-split over the union."""
    src = str(tmp_path / "farlate")
    spark.createDataFrame([], SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sess = sessionize_stream(stream, gap_minutes=30, watermark="6 hours")
    q = (
        sess.writeStream.format("memory")
        .queryName("farlate_sessions")
        .outputMode("append")
        .start()
    )
    try:
        # user 1: open session at 12:00; late event 9:00 is >30min away
        _feed(spark, q, src, [(1, _ts(12, 0), 1, "a", 1.0)])
        _feed(spark, q, src, [(2, _ts(9, 0), 1, "a", 1.0)])
        # user 2: open session at 12:00; late chain 11:10 + 11:35
        # bridges (11:10->11:35 = 25min, 11:35->12:00 = 25min): one
        # merged session starting 11:10
        _feed(spark, q, src, [(3, _ts(12, 0), 2, "a", 1.0)])
        _feed(spark, q, src, [(4, _ts(11, 10), 2, "a", 1.0), (5, _ts(11, 35), 2, "a", 1.0)])
        # fenceposts flush everything
        _feed(spark, q, src, [(6, datetime(2026, 1, 2, 5, 0), 9, "a", 1.0)])
        _feed(spark, q, src, [(7, datetime(2026, 1, 3, 5, 0), 8, "a", 1.0)])
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from farlate_sessions").collect()
    }
    # user 1: two separate sessions
    assert (1, _ts(9, 0), _ts(9, 0), 1) in got, got
    assert (1, _ts(12, 0), _ts(12, 0), 1) in got, got
    # user 2: one bridged session
    assert (2, _ts(11, 10), _ts(12, 0), 3) in got, got
