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
