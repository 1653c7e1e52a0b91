"""Source/sink format surface: the engine reads and writes more than
parquet — JSON lines, ORC, and header CSV roundtrips preserve values and
(where the format allows) types."""

from pyspark.sql import functions as F

from one_one_one_rule_spark.sources.fixtures import load_table


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_orc_roundtrip_preserves_schema_and_values(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert _sorted_rows(back, "n_nationkey") == _sorted_rows(src, "n_nationkey")


def test_json_roundtrip_with_declared_schema(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    src.write.mode("overwrite").json(path)
    # JSON is schemaless on disk: a production reader declares the schema
    # (schema-on-read) instead of paying inference + risking drift.
    back = spark.read.schema(src.schema).json(path)
    assert _sorted_rows(back, "r_regionkey") == _sorted_rows(src, "r_regionkey")


def test_csv_roundtrip_with_declared_schema(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "supplier")
    path = str(tmp_path / "supplier_csv")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).schema(src.schema).csv(path)
    assert _sorted_rows(back, "s_suppkey") == _sorted_rows(src, "s_suppkey")


def test_json_semi_structured_extraction(spark, sf_dir):
    """from_json with a declared struct — the general capability behind the
    reference's yfinance info-dict flattening (S5), beyond the
    get_json_object path the events queries use."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        F.from_json(F.col("props"), "k bigint").alias("p"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_str"),
    ).select("event_id", F.col("p.k").alias("k_struct"), "k_str")
    bad = parsed.filter(
        ~(
            F.col("k_struct").eqNullSafe(F.col("k_str"))
        )
    ).count()
    assert bad == 0


def test_fixture_dtypes_portable(spark, sf_dir):
    """Version-portability gate (round-2 postmortem): Spark's parquet
    TIMESTAMP(NANOS) handling changed across versions (3.x nanosAsLong conf
    -> 4.1 timestamp_ntz) and broke 5 queries at once. Every fixture table
    must load with usable dtypes on WHATEVER Spark is installed, so the
    next environment bump fails here first, loudly and in one place."""
    expected_key_dtypes = {
        "region": {"r_regionkey": "int"},
        "nation": {"n_nationkey": "int"},
        "customer": {"c_custkey": "bigint", "c_acctbal": "double"},
        "supplier": {"s_suppkey": "bigint"},
        "part": {"p_partkey": "bigint", "p_retailprice": "double"},
        "orders": {"o_orderkey": "bigint", "o_orderdate": "timestamp_ntz"},
        "lineitem": {"l_orderkey": "bigint", "l_shipdate": "timestamp_ntz"},
        "events": {"event_id": "bigint", "ts": "timestamp", "value": "double"},
        "documents": {"doc_id": "bigint", "text": "string"},
        "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
    }
    for table, cols in expected_key_dtypes.items():
        dtypes = dict(load_table(spark, sf_dir, table).dtypes)
        for col, want in cols.items():
            assert dtypes.get(col) == want, (
                f"{table}.{col}: got {dtypes.get(col)!r}, want {want!r}"
            )


def test_events_ts_values_sane(spark, sf_dir):
    """ts must land in the fixture's actual epoch (2024), not 1970 — the
    exact symptom of the round-2 nanos-misread (values off by 1000x)."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    assert bounds.lo.year >= 2000, bounds
    assert bounds.hi.year <= 2100, bounds


def test_events_stream_matches_batch_ingestion(spark, sf_dir):
    """The streaming reader (_events_stream) and batch reader (load_events)
    must agree on every ts value byte-for-byte."""
    from one_one_one_rule_spark.queries import _events_stream, _drain_stream

    name = "ts_parity_gate"
    drained = _drain_stream(
        spark, _events_stream(spark, sf_dir), name, "append"
    )
    got = drained.select(
        F.count("*").alias("n"),
        F.sum(F.unix_micros("ts")).alias("s"),
        F.min("ts").alias("lo"),
    ).collect()[0]
    batch = load_table(spark, sf_dir, "events")
    want = batch.select(
        F.count("*").alias("n"),
        F.sum(F.unix_micros("ts")).alias("s"),
        F.min("ts").alias("lo"),
    ).collect()[0]
    assert (got.n, got.s, got.lo) == (want.n, want.s, want.lo)


def test_parquet_schema_evolution_merge(spark, sf_dir, tmp_path):
    """Lakehouse schema evolution: a later batch adds a column; mergeSchema
    unions the schemas and back-fills NULL for old rows — the ingestion
    behavior a long-lived 100 TB table relies on when producers upgrade."""
    o = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "evolving")
    o.select("o_orderkey", "o_totalprice").write.mode("append").parquet(path)
    o.select(
        "o_orderkey", "o_totalprice",
        F.lit("v2").alias("ingest_version"),
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {
        "o_orderkey", "o_totalprice", "ingest_version"
    }
    n = o.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("ingest_version").isNull()).count() == n
    assert merged.filter(F.col("ingest_version") == "v2").count() == n


def test_xml_roundtrip_preserves_values(spark, sf_dir, tmp_path):
    """Spark 4 ships the XML source natively (merged spark-xml): a
    row-tagged roundtrip of the nation dim must preserve every value —
    the ingestion leg for feed-style XML drops."""
    nation = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_xml")
    (
        nation.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(p)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .load(p)
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    want = {
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in nation.select(
            "n_nationkey", "n_name", "n_regionkey"
        ).collect()
    }
    got = {
        (r.n_nationkey, r.n_name, r.n_regionkey) for r in back.collect()
    }
    assert got == want


def test_text_format_with_regexp_extraction(spark, sf_dir, tmp_path):
    """Log-file ingestion path: write delimited lines via the text
    source, read them back as raw lines and parse with regexp_extract —
    the unstructured-to-structured on-ramp (reference's CSV-with-
    conventions ingestion generalized to arbitrary line formats)."""
    nation = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_lines")
    nation.select(
        F.concat_ws(
            "|",
            F.col("n_nationkey").cast("string"),
            "n_name",
            F.col("n_regionkey").cast("string"),
        ).alias("value")
    ).write.mode("overwrite").text(p)
    lines = spark.read.text(p)
    parsed = lines.select(
        F.regexp_extract("value", r"^(\d+)\|", 1).cast("int").alias("k"),
        F.regexp_extract("value", r"^\d+\|([^|]*)\|", 1).alias("name"),
        F.regexp_extract("value", r"\|(\d+)$", 1).cast("int").alias("r"),
    )
    want = {
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in nation.select(
            "n_nationkey", "n_name", "n_regionkey"
        ).collect()
    }
    got = {(r.k, r.name, r.r) for r in parsed.collect()}
    assert got == want
