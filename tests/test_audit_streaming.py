"""audit: commit-per-bucket resume; streaming: checkpointed extraction
and last-write-wins keyed state."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark import audit
from pdf_parser_spark.streaming import draft_upsert_stream, stream_extract, windowed_event_counts


@pytest.fixture()
def pages_df(spark, pages_parquet):
    return spark.read.parquet(pages_parquet)


def test_audit_commit_and_resume(spark, pages_df, tmp_path):
    out = str(tmp_path / "out")
    # first run: only buckets 0 and 1
    r1 = audit.run_extraction_with_audit(
        spark, pages_df, out, run_id="r1", n_buckets=4, buckets=[0, 1]
    )
    assert r1["processed"] == [0, 1] and r1["skipped"] == []
    # resume: full range → 0,1 skipped via the audit table, 2,3 done
    r2 = audit.run_extraction_with_audit(spark, pages_df, out, run_id="r2", n_buckets=4)
    assert r2["processed"] == [2, 3]
    assert r2["skipped"] == [0, 1]
    # third run: nothing left
    r3 = audit.run_extraction_with_audit(spark, pages_df, out, run_id="r3", n_buckets=4)
    assert r3["processed"] == []
    # every input row landed exactly once
    extracted = spark.read.parquet(os.path.join(out, "extracted"))
    assert extracted.count() == pages_df.count()
    assert extracted.select("url").distinct().count() == pages_df.count()
    # audit table carries the north-rule counters with real lineage
    adf = spark.read.parquet(os.path.join(out, "audit"))
    tot = adf.agg(
        F.sum("docs").alias("docs"), F.sum("failures").alias("f"), F.sum("bytes").alias("b")
    ).collect()[0]
    assert tot["docs"] == pages_df.count()
    assert tot["f"] > 0  # corpus plants corrupt docs — they must be counted, not thrown
    assert tot["b"] > 0
    assert adf.select("run_id").distinct().count() >= 2


def test_audit_one_pass_single_extraction(spark, pages_df, tmp_path, monkeypatch):
    """The default path must build ONE extraction plan over the input
    for any number of pending buckets (round-1 re-scanned per bucket);
    recovery mode keeps the per-bucket loop."""
    calls = []
    real = audit.extract_documents

    def counting(df, mode="first_valid", **kw):
        calls.append(1)
        return real(df, mode=mode, **kw)

    monkeypatch.setattr(audit, "extract_documents", counting)
    out = str(tmp_path / "out")
    r = audit.run_extraction_with_audit(spark, pages_df, out, run_id="r1", n_buckets=6)
    assert r["processed"] == list(range(6))
    assert len(calls) == 1  # six buckets, one input scan
    extracted = spark.read.parquet(os.path.join(out, "extracted"))
    assert extracted.count() == pages_df.count()

    out2 = str(tmp_path / "out2")
    r2 = audit.run_extraction_with_audit(
        spark, pages_df, out2, run_id="r1", n_buckets=3, recovery=True
    )
    assert r2["processed"] == [0, 1, 2]
    assert len(calls) == 1 + 3  # fine-grained mode: one plan per bucket


def test_audit_mixed_mode_resume(spark, pages_df, tmp_path):
    """Buckets committed by recovery mode are honored by the one-pass
    path (shared layout + audit table), and vice versa."""
    out = str(tmp_path / "out")
    r1 = audit.run_extraction_with_audit(
        spark, pages_df, out, run_id="r1", n_buckets=4, buckets=[1], recovery=True
    )
    assert r1["processed"] == [1]
    r2 = audit.run_extraction_with_audit(spark, pages_df, out, run_id="r2", n_buckets=4)
    assert r2["processed"] == [0, 2, 3] and r2["skipped"] == [1]
    extracted = spark.read.parquet(os.path.join(out, "extracted"))
    assert extracted.count() == pages_df.count()
    assert extracted.select("url").distinct().count() == pages_df.count()


def test_audit_empty_pending_input(spark, tmp_path):
    """Zero pending rows must commit cleanly (zero metrics), not throw
    on schema inference over a data-less output directory."""
    empty = spark.createDataFrame(
        [],
        "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
    )
    out = str(tmp_path / "out")
    r = audit.run_extraction_with_audit(spark, empty, out, run_id="r0", n_buckets=4)
    assert r["processed"] == [0, 1, 2, 3]
    assert r["metrics"] == {"docs": 0, "failures": 0, "decode_fallbacks": 0, "bytes": 0}
    # empty buckets COMMIT (zero-row markers): a second run skips them
    # instead of re-scanning the input forever
    r2 = audit.run_extraction_with_audit(spark, empty, out, run_id="r1", n_buckets=4)
    assert r2["processed"] == [] and r2["skipped"] == [0, 1, 2, 3]



def test_audit_row_grain_resume(spark, pages_df):
    done = pages_df.select("url").limit(50)
    pending = audit.resume_pending(pages_df, done)
    assert pending.count() == pages_df.count() - 50


def test_stream_extract_checkpoint_resume(spark, tmp_path):
    """availableNow drains the backlog; a restart with the same
    checkpoint skips already-processed files."""
    from pdf_parser_spark.synth.pages import write_pages_parquet

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    write_pages_parquet(str(in_dir / "part1.parquet"), 40)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    q = stream_extract(spark, str(in_dir), ckpt, out)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == 40

    # new file arrives (fresh url range); restart from the same checkpoint
    write_pages_parquet(str(in_dir / "part2.parquet"), 24, start=40)
    q2 = stream_extract(spark, str(in_dir), ckpt, out)
    q2.awaitTermination(120)
    ext = spark.read.parquet(out)
    assert ext.count() == 64  # 40 old (not reprocessed) + 24 new
    assert ext.select("url").distinct().count() == 64


def test_draft_upsert_last_write_wins(spark, tmp_path):
    """S12 semantics through a real stream: per-session dict merge,
    later payloads overwrite earlier keys."""
    import pandas as pd

    rows = [
        ("s1", 1, json.dumps({"name": "A", "price": 1})),
        ("s1", 2, json.dumps({"price": 2})),
        ("s2", 1, json.dumps({"zip": "85260"})),
        ("s1", 3, json.dumps({"rush": "No Rush"})),
    ]
    src_dir = tmp_path / "updates"
    src_dir.mkdir()
    pd.DataFrame(rows, columns=["session_id", "ts", "payload_json"]).to_parquet(
        src_dir / "u1.parquet"
    )
    updates = (
        spark.readStream.schema("session_id string, ts long, payload_json string")
        .parquet(str(src_dir))
    )
    out = draft_upsert_stream(updates)
    q = (
        out.writeStream.format("memory")
        .queryName("drafts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["session_id"]: json.loads(r["draft_json"]) for r in spark.sql("select * from drafts").collect()}
    assert got["s1"] == {"name": "A", "price": 2, "rush": "No Rush"}
    assert got["s2"] == {"zip": "85260"}


def test_windowed_event_counts_batch(spark):
    """Window aggregation shape (batch-mode check of the streaming agg)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=m), m % 3, float(m)) for m in range(0, 150, 10)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    out = windowed_event_counts(df, window="1 hour", watermark="2 hours").collect()
    assert len(out) == 3  # 150 minutes → 3 hour-buckets
    assert sum(r["n_events"] for r in out) == 15


def test_windowed_event_counts_streaming_mode(spark, tmp_path):
    """The same windowed agg as a real stream: file source → watermark →
    append-mode sink (windows emit on close)."""
    import datetime as dt

    import pandas as pd

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
    rows = [(base + dt.timedelta(minutes=m), m % 3, float(m)) for m in range(0, 180, 10)]
    src = tmp_path / "events_stream"
    src.mkdir()
    # tz-aware parquet → Spark TIMESTAMP (watermarks reject NTZ)
    table = pa.Table.from_pylist(
        [{"ts": r[0], "user_id": r[1], "value": r[2]} for r in rows],
        schema=pa.schema(
            [("ts", pa.timestamp("us", tz="UTC")), ("user_id", pa.int64()), ("value", pa.float64())]
        ),
    )
    pq.write_table(table, src / "e1.parquet")
    stream = spark.readStream.schema("ts timestamp, user_id long, value double").parquet(
        str(src)
    )
    out = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from winagg").collect()
    # append mode emits only CLOSED windows (watermark passed): the last
    # hour stays open, the first two close
    assert len(got) == 2
    assert sum(r["n_events"] for r in got) == 12


def test_session_window_streaming_mode(spark, tmp_path):
    """Native session windows on a real stream: gap-separated bursts
    per user; append mode emits only watermark-closed sessions."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.streaming import session_window_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
    rows = []
    # user 0: two bursts separated by 2 h; user 1: one burst
    for m in (0, 5, 10, 120, 125):
        rows.append((base + dt.timedelta(minutes=m), 0, 1.0))
    for m in (0, 20):
        rows.append((base + dt.timedelta(minutes=m), 1, 2.0))
    # a late sentinel far in the future advances the watermark so the
    # real sessions close
    rows.append((base + dt.timedelta(hours=12), 9, 0.0))
    src = tmp_path / "sess_stream"
    src.mkdir()
    table = pa.Table.from_pylist(
        [{"ts": r[0], "user_id": r[1], "value": r[2]} for r in rows],
        schema=pa.schema(
            [("ts", pa.timestamp("us", tz="UTC")), ("user_id", pa.int64()), ("value", pa.float64())]
        ),
    )
    pq.write_table(table, src / "e1.parquet")
    stream = spark.readStream.schema("ts timestamp, user_id long, value double").parquet(str(src))
    out = session_window_counts(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sessagg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["n_events"]): r
        for r in spark.sql("select * from sessagg").collect()
    }
    # closed sessions: user0 burst1 (3 events), user0 burst2 (2), user1 (2)
    assert (0, 3) in got and (0, 2) in got and (1, 2) in got
    r = got[(0, 3)]
    assert (r["session_end"] - r["session_start"]).total_seconds() == 10 * 60 + 30 * 60
