"""applyInPandasWithState sessionization vs the batch sessionizer.

Two chunks stream through; emitted sessions must be exactly the batch-computed
sessions that CLOSED (followed by a later event beyond the gap, or timed out
once the watermark passed). Sessions still open at end-of-stream stay in
state — asserted by difference against the batch result.
"""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
GAP_S = 6 * 3600  # 6 hours: the synthetic events are day-spaced per user


@pytest.fixture(scope="module")
def events(spark):
    from pysparkline import tpch

    return tpch.read_events(spark, SF).select("user_id", "ts")


def _batch_sessions(spark, events, gap_s):
    """Reference answer: window-lag batch sessionization."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    df = (
        events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > gap_s)
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return df


def test_streaming_sessionize_matches_batch(spark, events, tmp_path):
    from pysparkline.streaming import streaming_sessionize

    # two chunk files so the watermark advances between micro-batches
    in_dir = str(tmp_path / "in")
    cut = events.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).collect()[0][0]
    events.where(F.unix_timestamp("ts") <= cut).write.parquet(in_dir + "/c1")
    events.where(F.unix_timestamp("ts") > cut).write.parquet(in_dir + "/c2")

    stream = (
        spark.readStream.schema(events.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    out = streaming_sessionize(
        stream, "user_id", "ts", gap_seconds=GAP_S, watermark="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sessions_out").collect()
    }
    assert got, "no sessions emitted"

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in _batch_sessions(spark, events, GAP_S).collect()
    }
    # every emitted session is a real batch session
    assert got <= batch, f"spurious sessions: {sorted(got - batch)[:3]}"
    # what's missing must be exactly sessions not yet closed at end-of-stream:
    # at most one (the last) per user
    open_per_user = {}
    for u, s, e, n in batch - got:
        assert u not in open_per_user, f"two unemitted sessions for user {u}"
        open_per_user[u] = (s, e, n)
    last_session = {
        r.user_id: r.session_start
        for r in _batch_sessions(spark, events, GAP_S)
        .groupBy("user_id")
        .agg(F.max("session_start").alias("session_start"))
        .collect()
    }
    for u, (s, e, n) in open_per_user.items():
        assert last_session[u] == s, (
            f"unemitted session for user {u} is not their last"
        )
