"""Streaming Python Data Source tests: deterministic quote source,
replayable offsets, checkpoint-resume continuation, and the two-phase
audit sink commit protocol (sources/quote_stream_datasource.py)."""

import os
import time

from one_one_one_rule_spark.sources.quote_stream_datasource import (
    JsonlAuditSinkDataSource,
    QuoteStreamDataSource,
    QuoteStreamReader,
    quote_price_cents,
    read_committed_audit,
)

SYMBOLS = ["AAPL", "MSFT", "NVDA", "GOOG"]


def expected_rows(ticks):
    return {
        (t, s, quote_price_cents(i, t))
        for t in range(ticks)
        for i, s in enumerate(SYMBOLS)
    }


def _await(cond, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.3)
    return False


def test_reader_read_and_replay_are_identical():
    r = QuoteStreamReader(
        {"ticks_per_batch": "3", "max_ticks": "8"}
    )
    assert r.initialOffset() == {"tick": 0}
    seen, off = [], {"tick": 0}
    while True:
        it, nxt = r.read(off)
        rows = list(it)
        if nxt == off:
            assert rows == []
            break
        seen.extend(rows)
        off = nxt
    assert off == {"tick": 8}
    assert len(seen) == 8 * len(SYMBOLS)
    # replay of ANY sub-range is bit-identical
    assert list(r.readBetweenOffsets({"tick": 0}, {"tick": 8})) == seen
    assert (
        list(r.readBetweenOffsets({"tick": 3}, {"tick": 6}))
        == seen[3 * len(SYMBOLS) : 6 * len(SYMBOLS)]
    )


def test_stream_to_memory_sink_is_exact(spark):
    spark.dataSource.register(QuoteStreamDataSource)
    df = (
        spark.readStream.format("ticker_quotes_stream")
        .option("ticks_per_batch", "3")
        .option("max_ticks", "6")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("quotes_mem")
        .outputMode("append")
        .start()
    )
    try:
        assert _await(
            lambda: spark.table("quotes_mem").count()
            >= 6 * len(SYMBOLS)
        )
    finally:
        q.stop()
    got = {
        (r.tick, r.symbol, r.price_cents)
        for r in spark.table("quotes_mem").collect()
    }
    assert got == expected_rows(6)


def test_audit_sink_commits_atomically_and_resumes(spark, tmp_path):
    spark.dataSource.register(QuoteStreamDataSource)
    spark.dataSource.register(JsonlAuditSinkDataSource)
    out = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")

    def run(max_ticks):
        df = (
            spark.readStream.format("ticker_quotes_stream")
            .option("ticks_per_batch", "2")
            .option("max_ticks", str(max_ticks))
            .load()
        )
        q = (
            df.writeStream.format("jsonl_audit_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            assert _await(
                lambda: len(read_committed_audit(out))
                >= max_ticks * len(SYMBOLS)
            )
        finally:
            q.stop()

    run(4)
    first = read_committed_audit(out)
    assert {
        (r["tick"], r["symbol"], r["price_cents"]) for r in first
    } == expected_rows(4)

    # restart against the SAME checkpoint with a larger horizon: continues
    # from the committed offset — no duplicated ticks, exact superset
    run(7)
    rows = read_committed_audit(out)
    got = [(r["tick"], r["symbol"], r["price_cents"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate rows after resume"
    assert set(got) == expected_rows(7)
    # no uncommitted temp litter
    assert not [f for f in os.listdir(out) if f.startswith(".tmp-")]
