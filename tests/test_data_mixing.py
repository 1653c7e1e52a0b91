"""Semantics tests for the data-mixing queries (round 5c):
language-balanced quota sampling, DSIR importance resampling, and
k-means cluster purity. Cross-engine value parity is covered by
tests/test_oracle_parity.py; these assert the operator CONTRACTS the
hash gate alone can't express (both quota branches exercised, score
monotonicity toward the target domain, purity bounds)."""

from one_one_one_rule_spark.queries import QUERIES


def test_language_quota_caps_head_and_passes_tail(spark, sf_dir):
    from one_one_one_rule_spark.queries_text import _LANG_CAP
    from one_one_one_rule_spark.sources.fixtures import load_table

    out = QUERIES["docs_language_balanced_sample"](spark, sf_dir)
    per_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    corpus = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert per_lang, "sample is empty"
    for lang, n in per_lang.items():
        assert n == min(corpus[lang], _LANG_CAP), lang
    # the fixture must exercise BOTH branches: at least one language is
    # capped (downsampled head) and at least one passes through whole
    assert any(corpus[lg] > _LANG_CAP for lg in per_lang)
    assert any(corpus[lg] <= _LANG_CAP for lg in per_lang)


def test_dsir_enriches_target_share_in_topk(spark, sf_dir):
    from one_one_one_rule_spark.queries_text import (
        _DSIR_TARGET,
        _DSIR_TOPK,
    )
    from one_one_one_rule_spark.sources.fixtures import load_table

    out = QUERIES["docs_dsir_importance_resample"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) == _DSIR_TOPK
    # scores are sorted desc with doc_id tiebreak, and every score is a
    # sum of non-negative integer-ppm ratios
    scores = [(r.score_ppm, r.doc_id) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
    assert all(r.score_ppm >= 0 for r in rows)
    # importance resampling must pull the target domain in: the target
    # source's share of the selected top-K strictly exceeds its share of
    # the corpus (the whole point of the DSIR contrast)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_target = docs.filter(f"source = '{_DSIR_TARGET}'").count()
    picked = {r.doc_id for r in rows}
    picked_target = docs.filter(f"source = '{_DSIR_TARGET}'").filter(
        docs.doc_id.isin(picked)
    ).count()
    assert picked_target / len(picked) > n_target / n_docs


def test_cluster_purity_bounds_and_totals(spark, sf_dir):
    from one_one_one_rule_spark.sources.fixtures import load_table

    out = QUERIES["embeddings_cluster_purity"](spark, sf_dir)
    rows = out.collect()
    assert rows, "no cells"
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_total
    for r in rows:
        assert 1 <= r.top_label_n <= r.n_vecs
        # floor(top_n*1e6/n) in [1e6/n_labels-ish .. 1e6]
        assert 0 < r.purity_ppm <= 1_000_000
        assert r.purity_ppm == r.top_label_n * 1_000_000 // r.n_vecs


def test_ccnet_buckets_partition_scored_docs(spark, sf_dir):
    out = QUERIES["docs_ccnet_quality_buckets"](spark, sf_dir)
    rows = {r.bucket: r for r in out.collect()}
    assert set(rows) == {"head", "middle", "tail"}
    assert all(r.n_docs > 0 for r in rows.values())
    scored = QUERIES["docs_bigram_lm_score"](spark, sf_dir)
    # the buckets partition exactly the scoreable docs (docs with >=1
    # corpus bigram), nothing dropped or double-counted
    assert sum(r.n_docs for r in rows.values()) == scored.count()


def test_gini_bounds_and_benford_conformance(spark, sf_dir):
    gini = {r.nation: r for r in QUERIES["customer_spend_gini"](spark, sf_dir).collect()}
    assert gini
    for r in gini.values():
        # Gini of a non-degenerate non-negative distribution: [0, 1e6)
        assert 0 <= r.gini_ppm < 1_000_000
        assert r.n_customers > 0 and r.total_cents >= 0
    ben = QUERIES["events_benford_audit"](spark, sf_dir).collect()
    assert {r.d for r in ben} <= set(range(1, 10))
    assert abs(sum(r.obs_ppm for r in ben) - 1_000_000) < 10  # floor slack
    by_d = {r.d: r for r in ben}
    # expected literals wired through intact, digit 1 dominant (the
    # fixture is lognormal-ish, i.e. NEAR-Benford), and the deviation
    # column is consistent with obs/exp
    assert by_d[1].exp_ppm == 301030 and by_d[9].exp_ppm == 45757
    assert by_d[1].obs_ppm == max(r.obs_ppm for r in ben)
    assert all(r.abs_dev_ppm == abs(r.obs_ppm - r.exp_ppm) for r in ben)
