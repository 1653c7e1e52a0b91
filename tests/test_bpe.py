"""Unit tests for the distributed BPE trainer (operators/bpe.py) and the
dim-correlation guard rails (queries_embeddings.py)."""

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.bpe import (
    merge_pair_in_arrays,
    train_bpe,
    word_dictionary,
)


def _merge(spark, arr, x, y):
    df = spark.createDataFrame([(arr,)], "s array<string>")
    return df.select(
        merge_pair_in_arrays(F.col("s"), x, y).alias("m")
    ).collect()[0]["m"]


def test_merge_scan_is_left_to_right_non_overlapping(spark):
    # adjacent sites chain: scan resumes AFTER the consumed pair and the
    # next token may start a new match
    assert _merge(spark, ["x", "y", "x", "y"], "x", "y") == ["xy", "xy"]
    # overlapping run merges greedily left-first, never cascades in-round
    assert _merge(spark, ["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge(spark, ["a", "a", "a", "a", "a"], "a", "a") == [
        "aa",
        "aa",
        "a",
    ]
    # no match / too short / empty are identity
    assert _merge(spark, ["b", "c"], "x", "y") == ["b", "c"]
    assert _merge(spark, ["x"], "x", "y") == ["x"]
    assert _merge(spark, [], "x", "y") == []
    # merged token from an earlier round can be the left symbol
    assert _merge(spark, ["ab", "c", "d"], "ab", "c") == ["abc", "d"]


def test_train_bpe_learns_weighted_merges_with_deterministic_ties(spark):
    # freq-weighted: ('l','o') appears in 'low'x5 + 'lot'x1 = 6,
    # ('o','w') only in 'low'x5 = 5 -> first merge is (l,o).
    # Round 2 ties at 5 between ('e','r'), ('lo','w') and ('r','r');
    # lexicographic tie-break picks ('e','r'). Round 3 ties at 5 between
    # ('er','r') and ('lo','w'); 'er' < 'lo' picks ('er','r').
    words = spark.createDataFrame(
        [("low", 5), ("lot", 1), ("err", 5)], "w string, freq bigint"
    )
    merges, sym = train_bpe(words, n_merges=3)
    assert merges[0] == ("l", "o", 6)
    assert merges[1] == ("e", "r", 5)
    assert merges[2] == ("er", "r", 5)
    out = {
        tuple(r["s"]): r["freq"]
        for r in sym.select("freq", "s").collect()
    }
    assert out == {("lo", "w"): 5, ("lo", "t"): 1, ("err",): 5}


def test_train_bpe_stops_when_no_pairs_remain(spark):
    words = spark.createDataFrame([("ab", 3)], "w string, freq bigint")
    merges, sym = train_bpe(words, n_merges=5)
    # round 1 merges the only pair; afterwards every word is one symbol
    assert merges == [("a", "b", 3)]
    assert sym.select("s").collect()[0]["s"] == ["ab"]


def test_word_dictionary_filters_to_ascii_lowercase(spark):
    docs = spark.createDataFrame(
        [(1, "the cat  the Dog 42 \t cat\n")], "doc_id bigint, text string"
    )
    got = {
        r["w"]: r["freq"]
        for r in word_dictionary(docs, "text").collect()
    }
    assert got == {"the": 2, "cat": 2}


def test_dim_correlation_rejects_ragged_vectors(spark, tmp_path):
    from one_one_one_rule_spark.queries import QUERIES

    p = str(tmp_path / "ragged")
    spark.createDataFrame(
        [(0, [0.1, 0.2], 0), (1, [0.3], 1)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(p + "/embeddings.parquet")
    with pytest.raises(ValueError, match="fixed-length"):
        QUERIES["embeddings_dim_correlation"](spark, p).collect()


def test_merge_fold_matches_python_reference_on_random_arrays(spark):
    """Randomized equivalence: the JVM aggregate-fold merge scan must
    equal the sequential Python reference (oracles_text.py trainer's
    rewrite) on arbitrary symbol arrays — one Spark job over 300 cases."""
    import random

    def py_merge(syms, x, y):
        out, k = [], 0
        while k < len(syms):
            if k + 1 < len(syms) and syms[k] == x and syms[k + 1] == y:
                out.append(x + y)
                k += 2
            else:
                out.append(syms[k])
                k += 1
        return out

    rng = random.Random(20260814)
    alphabet = ["a", "b", "ab", "ba", "c"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randrange(0, 12))]
        for _ in range(300)
    ]
    x, y = "a", "b"
    df = spark.createDataFrame(
        [(i, arr) for i, arr in enumerate(cases)],
        "case_id bigint, s array<string>",
    )
    got = {
        r["case_id"]: r["m"]
        for r in df.select(
            "case_id", merge_pair_in_arrays(F.col("s"), x, y).alias("m")
        ).collect()
    }
    for i, arr in enumerate(cases):
        assert got[i] == py_merge(arr, x, y), (i, arr)
