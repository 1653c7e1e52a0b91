"""Source/sink adapter tests: CSV ticker scan with column resolution,
fallback chain, distributed fundamentals fetch (injected fetch_fn), CSV
single-file sink, local post-sink upsert."""

import os

import pytest

from one_one_one_rule_spark.operators.output import (
    build_output,
    write_single_csv,
)
from one_one_one_rule_spark.sources.sinks import LocalCopySink, ship
from one_one_one_rule_spark.sources.tickers import (
    load_tickers,
    normalized_distinct,
    tickers_from_csv,
)
from one_one_one_rule_spark.sources.yfinance_source import (
    fetch_fundamentals_distributed,
)


@pytest.fixture()
def ticker_csv(tmp_path):
    p = tmp_path / "tickers.csv"
    p.write_text("Symbol,Name\n aapl ,Apple\nMSFT,Microsoft\nbrk.b,Berkshire\nAAPL,Apple dup\n,empty\n")
    return str(p)


def test_csv_scan_case_insensitive_column(spark, ticker_csv):
    df = tickers_from_csv(spark, ticker_csv)  # resolves 'Symbol'
    assert df.columns == ["symbol"]
    assert df.count() == 5


def test_normalize_distinct_sorted(spark, ticker_csv):
    out = normalized_distinct(tickers_from_csv(spark, ticker_csv)).collect()
    assert [r.symbol for r in out] == ["AAPL", "BRK-B", "MSFT"]


def test_fallback_chain_and_empty_raises(spark, ticker_csv, tmp_path):
    # wikipedia disabled -> csv fallback works
    assert load_tickers(spark, ticker_csv).count() == 3
    empty = tmp_path / "empty.csv"
    empty.write_text("Symbol\n")
    with pytest.raises(ValueError):
        load_tickers(spark, str(empty))


def test_distributed_fetch_with_injected_fn(spark, ticker_csv):
    tickers = normalized_distinct(tickers_from_csv(spark, ticker_csv))

    def fake_fetch(t):
        return {
            "ticker": t,
            "company": f"{t} inc",
            "sector": "Tech",
            "price": float(len(t)),
            "market_cap": 1e9,
            "currency": "USD",
            "trailing_pe": 10.0,
            "forward_pe": None,
            "trailing_eps": 1.0,
            "forward_eps": None,
            "earnings_growth": "0.5",  # string -> coerced to double
            "peg_ratio": None,
            "book_value_per_share": 2.0,
            "target_mean_price": None,
        }

    snap = fetch_fundamentals_distributed(tickers, fetch_fn=fake_fetch, parallelism=2)
    rows = {r.ticker: r for r in snap.collect()}
    assert set(rows) == {"AAPL", "BRK-B", "MSFT"}
    assert rows["AAPL"].earnings_growth == 0.5  # coerced
    assert dict(snap.dtypes)["earnings_growth"] == "double"


def test_single_csv_sink_and_post_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("AAPL", 1.0), ("MSFT", None)], "ticker string, x double"
    )
    out = build_output(df, "2026-01-01", "2026-01-01T00:00:00Z")
    assert out.columns[:3] == ["as_of_date", "run_ts_utc", "ticker"]
    path = write_single_csv(out, str(tmp_path / "out.csv"))
    text = open(path).read().splitlines()
    assert text[0] == "as_of_date,run_ts_utc,ticker,x"
    assert len(text) == 3
    assert text[1].endswith("1.0") or text[2].endswith("1.0")

    # post-sink upsert-by-name: second ship overwrites
    sink = LocalCopySink(str(tmp_path / "drive"))
    dest1 = ship(path, sink, "valuations.csv")
    dest2 = ship(path, sink, "valuations.csv")
    assert dest1 == dest2 and os.path.exists(dest1)
    assert ship(path, None) is None


# ---------------------------------------------------------------------------
# S1/S2 — Wikipedia constituents probe on fixture HTML (offline)
# ---------------------------------------------------------------------------

WIKI_FIXTURE = """
<html><body>
<table>
  <tr><th>Date</th><th>Event</th></tr>
  <tr><td>1999</td><td>Index launched</td></tr>
</table>
<table>
  <tr><th>Company</th><th>Ticker</th><th>Sector</th></tr>
  {rows}
</table>
<table>
  <tr><th>Symbol</th></tr>
  <tr><td>ONLY1</td></tr>
</table>
</body></html>
"""


def _wiki_html(n=85):
    rows = "\n".join(
        f"  <tr><td>Company {i}</td><td>tk.{i:03d}</td><td>Tech</td></tr>"
        for i in range(n)
    )
    return WIKI_FIXTURE.format(rows=rows)


def test_probe_fixture_html_passes_gate(spark):
    from one_one_one_rule_spark.sources.tickers import (
        parse_html_tables,
        probe_ticker_tables,
        tickers_from_html,
    )

    html = _wiki_html(85)
    tables = parse_html_tables(html)
    assert len(tables) == 3  # decoy, constituents, short table all parsed
    syms = probe_ticker_tables(tables)
    # normalized (strip/upper/.->-), sorted distinct, >= 80 gate passed
    assert syms is not None and len(syms) == 85
    assert syms[0] == "TK-000" and syms == sorted(syms)

    df = tickers_from_html(spark, html)
    assert df is not None
    assert df.count() == 85


def test_probe_gate_rejects_short_table(spark):
    from one_one_one_rule_spark.sources.tickers import (
        parse_html_tables,
        probe_ticker_tables,
        tickers_from_html,
    )

    html = _wiki_html(40)  # constituents table below the >=80 sanity gate
    assert probe_ticker_tables(parse_html_tables(html)) is None
    assert tickers_from_html(spark, html) is None


def test_probe_dedups_before_gate():
    from one_one_one_rule_spark.sources.tickers import probe_ticker_tables

    # 100 raw rows but only 50 distinct normalized symbols -> rejected:
    # the gate applies to the normalized distinct universe, not raw rows.
    class T:
        columns = ["Ticker"]

        def __getitem__(self, key):
            return [f"DUP{i % 50}" for i in range(100)]

    assert probe_ticker_tables([T()]) is None


# ---------------------------------------------------------------------------
# S8/S9/F18 — Drive sink dry-run planner (offline branch parity)
# ---------------------------------------------------------------------------


def test_drive_query_escaping_and_shapes():
    from one_one_one_rule_spark.sources.sinks import (
        FOLDER_MIME,
        build_find_file_query,
        build_find_folder_query,
        escape_drive_query,
    )

    assert escape_drive_query("bob's data.csv") == "bob\\'s data.csv"
    q = build_find_file_query("bob's data.csv", folder_id="F1")
    assert q == "name='bob\\'s data.csv' and trashed=false and 'F1' in parents"
    assert build_find_file_query("a.csv") == "name='a.csv' and trashed=false"
    fq = build_find_folder_query("reports", parent_id="P")
    assert fq == (
        f"mimeType='{FOLDER_MIME}' and name='reports' and trashed=false"
        " and 'P' in parents"
    )


def test_drive_upload_plan_branches():
    from one_one_one_rule_spark.sources.sinks import (
        SHEET_MIME,
        plan_drive_upload,
    )
    import pytest as _pytest

    # create: no existing file, folder known, convert -> Sheets MIME metadata
    plan = plan_drive_upload("v.csv", existing={}, folder_id="F1")
    assert plan["action"] == "create"
    assert plan["metadata"] == {
        "name": "v.csv",
        "parents": ["F1"],
        "mimeType": SHEET_MIME,
    }
    assert "name='v.csv'" in plan["query"]

    # update: found by name as an existing Sheet
    plan = plan_drive_upload(
        "v.csv", existing={"v.csv": ("ID9", SHEET_MIME)}, folder_id="F1"
    )
    assert plan == {
        "action": "update",
        "file_id": "ID9",
        "query": "name='v.csv' and trashed=false and 'F1' in parents",
        "media_mime": "text/csv",
    }

    # found but NOT a Sheet while converting -> recreate (load_drive.py:219-235)
    plan = plan_drive_upload(
        "v.csv", existing={"v.csv": ("ID9", "text/csv")}, folder_id="F1"
    )
    assert plan["action"] == "create"

    # no conversion: update whatever was found
    plan = plan_drive_upload(
        "v.csv",
        existing={"v.csv": ("ID9", "text/csv")},
        folder_id="F1",
        convert_to_sheets=False,
    )
    assert plan["action"] == "update" and plan["file_id"] == "ID9"

    # explicit file_id skips the find query entirely
    plan = plan_drive_upload(
        "v.csv",
        existing={"other": ("IDX", SHEET_MIME)},
        folder_id="F1",
        file_id="IDX",
    )
    assert plan["action"] == "update" and plan["query"] is None

    # explicit-but-unknown file_id while converting -> get() fails -> create
    plan = plan_drive_upload(
        "v.csv", existing={}, folder_id="F1", file_id="GONE"
    )
    assert plan["action"] == "create" and plan["query"] is None

    # service account creating without a folder -> hard error
    with _pytest.raises(ValueError, match="folder_id is required"):
        plan_drive_upload("v.csv", existing={})

    # oauth may create in root; no parents in metadata
    plan = plan_drive_upload("v.csv", existing={}, auth_mode="oauth")
    assert plan["action"] == "create" and "parents" not in plan["metadata"]


def test_assemble_snapshot_coalesce_chains():
    from one_one_one_rule_spark.sources.yfinance_source import (
        assemble_snapshot,
        fixture_fetch,
    )

    # fast wins over info; '' name falls through; missing sector -> Unknown
    snap = assemble_snapshot(
        "T1",
        {"shortName": "", "longName": "Long", "currentPrice": 9.0},
        {"last_price": 10.0, "currency": None},
    )
    assert snap["company"] == "Long"
    assert snap["sector"] == "Unknown"
    assert snap["price"] == 10.0  # fast.last_price preferred
    assert snap["currency"] == ""

    snap = assemble_snapshot(
        "T1", {"currentPrice": 9.0, "currency": "EUR"}, {}
    )
    assert snap["price"] == 9.0 and snap["currency"] == "EUR"

    # fixture fetcher: deterministic and fully assembled
    a, b = fixture_fetch("T12"), fixture_fetch("T12")
    assert a == b and a["ticker"] == "T12"
    assert fixture_fetch("T9")["market_cap"] == 9e6  # info fallback
    assert fixture_fetch("T8")["market_cap"] == 16e6  # fast wins


def test_python_datasource_ticker_scan(spark, ticker_csv):
    """The S1-S4 fallback chain behind the Spark 4 Python Data Source API:
    registered format, option-driven, partitioned scan — same symbols as
    the helper-function CSV path."""
    from one_one_one_rule_spark.sources.ticker_datasource import (
        TickerDataSource,
    )

    spark.dataSource.register(TickerDataSource)
    df = (
        spark.read.format("nasdaq_tickers")
        .option("csv_path", ticker_csv)
        .option("num_partitions", "2")
        .load()
    )
    assert df.schema.simpleString() == "struct<symbol:string>"
    assert df.rdd.getNumPartitions() == 2
    # Spark's CSV reader surfaces the empty field as NULL, the stdlib csv
    # module as "" — equivalent for the downstream normalize/drop stage.
    got = sorted(r.symbol or "" for r in df.collect())
    expected = sorted(
        r.symbol or ""
        for r in tickers_from_csv(spark, ticker_csv).collect()
    )
    assert got == expected


def test_python_datasource_empty_raises(spark, tmp_path):
    from one_one_one_rule_spark.sources.ticker_datasource import (
        TickerDataSource,
    )

    empty = tmp_path / "empty.csv"
    empty.write_text("Symbol\n")
    spark.dataSource.register(TickerDataSource)
    df = (
        spark.read.format("nasdaq_tickers")
        .option("csv_path", str(empty))
        .load()
    )
    with pytest.raises(Exception, match="no tickers available"):
        df.collect()
