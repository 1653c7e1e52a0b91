"""Streaming Python Data Source pair: quote ticks in, audit-log sink out.

Extends the reference's polling extraction model
(/root/reference/one_one_one_rule/transform_valuation.py:42-87 fetches a
quote snapshot per ticker per run) to the streaming surface Spark 4 adds
for Python sources:

* ``ticker_quotes_stream`` — a :class:`SimpleDataSourceStreamReader`
  producing one deterministic quote per symbol per tick. Offsets are the
  tick counter, so every micro-batch is a REPLAYABLE pure function of its
  offset range: ``readBetweenOffsets`` regenerates any batch bit-identically
  after a failure, which is the contract that makes the source
  exactly-once-capable (the same idempotence-by-construction argument as
  the batch ticker source's snapshot-in-partition design,
  ticker_datasource.py:_Slice).
* ``jsonl_audit_sink`` — a :class:`DataSourceStreamWriter` with the full
  two-phase commit protocol: executors write per-partition temp files and
  return them in :class:`WriterCommitMessage`s; the driver's ``commit``
  publishes them under batch-scoped names plus a manifest, ``abort``
  removes the temps. A reader that follows manifests sees each batch
  atomically — task retries leave only orphaned temps, never partial
  batches.

Offline by design: prices come from a seeded integer walk (no network),
mirroring how the yfinance fetcher is injected in yfinance_source.py.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

DEFAULT_SYMBOLS = "AAPL,MSFT,NVDA,GOOG"

_MULT = 2654435761  # Knuth multiplicative hash constant (public domain)
_MOD = 1000000007


def quote_price_cents(symbol_index: int, tick: int) -> int:
    """Deterministic pseudo-quote: base 100.00 plus a bounded hash walk.

    Pure integer function of (symbol, tick) — the replay contract of the
    stream reader and the oracle the tests recompute independently."""
    h = (tick * _MULT + symbol_index * 40503) % _MOD
    return 10000 + (h % 2001) - 1000


class QuoteStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self._symbols = [
            s for s in options.get("symbols", DEFAULT_SYMBOLS).split(",") if s
        ]
        self._ticks_per_batch = int(options.get("ticks_per_batch", "4"))
        self._max_ticks = int(options.get("max_ticks", str(2**62)))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def _rows(self, start: int, end: int) -> list:
        # a LIST, not a generator: Spark's prefetch cache copies the
        # returned iterator between read() and the batch planning hop, and
        # generators are neither copyable nor picklable. The batch is
        # bounded by ticks_per_batch x symbols, so materializing is cheap.
        return [
            (tick, sym, quote_price_cents(i, tick))
            for tick in range(start, end)
            for i, sym in enumerate(self._symbols)
        ]

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        s = int(start["tick"])
        e = min(s + self._ticks_per_batch, self._max_ticks)
        if e <= s:  # source drained: hold the offset, emit nothing
            return iter([]), {"tick": s}
        return iter(self._rows(s, e)), {"tick": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # replay path after failure recovery: MUST regenerate the exact
        # rows of the original batch — trivially true for a pure function
        # of the offset range
        return iter(self._rows(int(start["tick"]), int(end["tick"])))


class QuoteStreamDataSource(DataSource):
    """``spark.readStream.format("ticker_quotes_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "ticker_quotes_stream"

    def schema(self) -> str:
        return "tick bigint, symbol string, price_cents bigint"

    def simpleStreamReader(self, schema) -> QuoteStreamReader:
        return QuoteStreamReader(self.options)


@dataclass
class _PartFile(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonlAuditStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_audit_sink: 'path' option is required")
        self._path = path

    def write(self, iterator) -> _PartFile:
        # executor side: stage everything in a temp file; nothing under a
        # committed name until the driver publishes the whole batch
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _PartFile(tmp_path=tmp, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        # driver side, runs once per successful batch: atomic renames then
        # a manifest — readers that follow manifests see batches atomically
        names = []
        for i, m in enumerate(messages):
            if m is None or m.n_rows == 0:
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)
                continue
            final = os.path.join(
                self._path, f"batch{batchId:06d}-part{i:04d}.jsonl"
            )
            os.replace(m.tmp_path, final)
            names.append({"file": os.path.basename(final), "rows": m.n_rows})
        if not names:
            # idle micro-batch: no data files were committed, so skip the
            # manifest too — long-running streams would otherwise litter
            # the audit dir with empty manifests readers must iterate
            return
        manifest = os.path.join(self._path, f"batch{batchId:06d}.manifest")
        with open(manifest, "w", encoding="utf-8") as fh:
            json.dump({"batch_id": batchId, "files": names}, fh)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class JsonlAuditSinkDataSource(DataSource):
    """``df.writeStream.format("jsonl_audit_sink").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit_sink"

    def schema(self) -> str:  # pragma: no cover - sink never infers
        return "tick bigint, symbol string, price_cents bigint"

    def streamWriter(self, schema, overwrite: bool) -> JsonlAuditStreamWriter:
        return JsonlAuditStreamWriter(self.options)


def read_committed_audit(path: str) -> list[dict]:
    """Manifest-following reader: rows from COMMITTED batches only —
    orphaned temp files from failed attempts are invisible."""
    rows: list[dict] = []
    if not os.path.isdir(path):
        return rows
    for mf in sorted(f for f in os.listdir(path) if f.endswith(".manifest")):
        with open(os.path.join(path, mf), encoding="utf-8") as fh:
            manifest = json.load(fh)
        for entry in manifest["files"]:
            with open(os.path.join(path, entry["file"]), encoding="utf-8") as fh:
                rows.extend(json.loads(line) for line in fh)
    return rows
