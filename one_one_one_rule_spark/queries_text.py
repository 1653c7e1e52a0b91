"""Tokenizer-training queries over the documents corpus.

* ``docs_bpe_vocab`` — distributed BPE merge training (operators/bpe.py)
  surfaced as the post-training weighted sub-word vocabulary, hash-gated
  by a GENERATED oracle (oracles_text.py) that retrains the merges with a
  sequential pure-Python reference and re-applies them in portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import oracles_text as _ora_text
from .queries import register
from .sources.fixtures import load_table


@register("docs_bpe_vocab", _ora_text.bpe_vocab_oracle_sql())
def docs_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (8 merges) over the documents corpus,
    returning the learned sub-word vocabulary with exact corpus-weighted
    frequencies.

    The corpus collapses once to its distinct-word frequency dictionary
    (the only corpus-linear pass, map-side combinable); all 8 training
    rounds run over the vocabulary-sized dictionary with a bounded 1-row
    collect per round (the learned rule) and a shuffle-free JVM fold
    rewrite — see operators/bpe.py for the 100 TB design notes. Gated by
    the generated oracle in oracles_text.py: a wrong merge at any round
    changes the final vocabulary hash.
    """
    from .operators.bpe import train_bpe, word_dictionary

    _merges, sym = train_bpe(
        word_dictionary(load_table(spark, sf_dir, "documents")),
        n_merges=_ora_text.N_MERGES,
    )
    return (
        sym.select("freq", F.explode("s").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("n_weighted"))
    )


def _word_bigram_pairs(docs: DataFrame) -> DataFrame:
    """Distinct-free (doc_id, w1, w2) word-bigram relation via the
    window-free zip_with of the filtered token array against its shifted
    self — shared by the LM scorer and the novelty curve so the
    extraction (and its padding/slice arithmetic) cannot drift between
    them."""
    toks = F.filter(
        F.split("text", "\\s+"), lambda w: w.rlike("^[a-z]+$")
    )
    bi = F.zip_with(
        toks,
        F.slice(
            F.concat(toks, F.array(F.lit(None).cast("string"))),
            2,
            F.greatest(F.size(toks), F.lit(1)),
        ),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select("doc_id", F.explode(bi).alias("t"))
        .select("doc_id", "t.w1", "t.w2")
        .filter(F.col("w2").isNotNull())
    )


# Shared corpus-LM scoring CTE chain: ONE definition of tokenize → bigram
# → model → per-doc score, consumed by BOTH the docs_bigram_lm_score
# oracle and the docs_ccnet_quality_buckets oracle — a tokenization or
# total fix applied here cannot desynchronize the two gates (the same
# no-drift rationale as _word_bigram_pairs on the Spark side).
_LM_SCORED_CTES = """
WITH toks AS (
  SELECT doc_id, w, CAST(k AS BIGINT) AS k FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS k
    FROM documents
  ) t WHERE regexp_matches(w, '^[a-z]+$')
),
seq AS (
  SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY k) AS r
  FROM toks
),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM seq a JOIN seq b ON a.doc_id = b.doc_id AND b.r = a.r + 1
),
model AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY w1, w2
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM big),
scored AS (
  SELECT big.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(model.c) AS DOUBLE)
           / (CAST(COUNT(*) AS DOUBLE) * CAST((SELECT n FROM tot) AS DOUBLE))
           AS score
  FROM big JOIN model ON big.w1 = model.w1 AND big.w2 = model.w2
  GROUP BY big.doc_id
)"""


@register(
    "docs_bigram_lm_score",
    _LM_SCORED_CTES
    + """
SELECT doc_id, n_bigrams, score AS avg_bigram_prob FROM scored
""",
)
def docs_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model quality score per document —
    the classic model-based junk filter: train word-bigram counts over
    the WHOLE corpus, then score each document by its mean bigram
    relative frequency (documents whose word transitions are rare under
    the corpus model surface as outliers/noise).

    Determinism: the score is (Σ count(bigram)) / (n_bigrams · N_total) —
    a ratio of exact BIGINT aggregates, computed with linear probability
    mass instead of log-likelihood (the repo-wide no-transcendentals
    convention; ordering is monotone-equivalent for fixed n_bigrams).

    Scale shape: bigram extraction is WINDOW-FREE on the Spark side — a
    JVM ``zip_with`` of the token array against its shifted self (the
    oracle's row_number formulation would shuffle every token row twice);
    the model is a combinable groupBy over bigram keys; scoring is a
    keyed join of the corpus bigrams against the model — both sides
    bigram-keyed, co-partitioned by the same shuffle, no broadcast of
    anything corpus-linear (the model is vocab²-bounded but the plan
    does not rely on it fitting in memory). The bigram relation is
    checkpointed because it feeds the model, the total AND the scoring
    join.
    """
    docs = load_table(spark, sf_dir, "documents")
    return _lm_scored(docs).select(
        "doc_id", "n_bigrams", F.col("score").alias("avg_bigram_prob")
    )


def _lm_scored(docs: DataFrame) -> DataFrame:
    """Per-doc corpus-LM score relation (doc_id, n_bigrams, score) — the
    Spark mirror of the shared ``_LM_SCORED_CTES`` chain, consumed by
    docs_bigram_lm_score AND docs_ccnet_quality_buckets so the scoring
    stage (not just the bigram extraction) has one definition."""
    big = _word_bigram_pairs(docs).localCheckpoint(eager=True)
    model = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = big.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    joined = big.join(model, ["w1", "w2"]).join(F.broadcast(tot))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        (
            F.sum("c").cast("double")
            / (
                F.count(F.lit(1)).cast("double")
                * F.first("n").cast("double")
            )
        ).alias("score"),
    )


@register(
    "docs_source_temperature_resample",
    """
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
targets AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 8.0e0) AS BIGINT)
           AS target
  FROM counts
),
keep AS (
  SELECT d.doc_id, d.source, t.n_docs, t.target
  FROM documents d JOIN targets t ON d.source = t.source
  WHERE (((d.doc_id % 1000000007) * 2654435761) % 1000000007)
          % t.n_docs < t.target
)
SELECT source, CAST(MIN(n_docs) AS BIGINT) AS n_docs,
       CAST(MIN(target) AS BIGINT) AS target,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM keep GROUP BY source
""",
)
def docs_source_temperature_resample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-based (α = 0.5) mixture rebalancing across sources —
    the data-mixing step of a training pipeline: over-represented
    sources are down-sampled toward √n so no single domain dominates
    the mixture, with the per-source keep decision made by a
    deterministic multiplicative-hash threshold.

    Contrast with docs_stratified_sample (fixed quota via per-stratum
    window rank): here the quota is DERIVED from the source counts and
    selection is WINDOW-FREE — ``hash(doc_id) mod n_source < target``
    needs no per-stratum sort, so the corpus streams through a broadcast
    join against the tiny per-source target table and a map-side filter;
    the only corpus-sized shuffle is the final per-source audit
    aggregate. Sampled counts concentrate at the target (binomial, not
    exact-quota) — the production trade for removing the stratum sort.
    sqrt-of-integer→floor is IEEE-exact and identical on both engines.
    The output audits the resample: per source, the incoming count, the
    target, the achieved count, and the exact id checksum of the kept
    set (proves both engines kept the SAME documents, not just the same
    number).
    """
    docs = load_table(spark, sf_dir, "documents")
    cnts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tgt = cnts.withColumn(
        "target",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 8.0).cast(
            "bigint"
        ),
    )
    # doc_id is reduced mod p BEFORE the multiply so the product is
    # bounded by p * 2654435761 < 2^62 — overflow-safe at ANY corpus id
    # range (a raw doc_id * 2654435761 wraps past doc_id ~ 3.5e9)
    keep = docs.join(F.broadcast(tgt), "source").filter(
        (((F.col("doc_id") % 1000000007) * 2654435761) % 1000000007)
        % F.col("n_docs")
        < F.col("target")
    )
    return keep.groupBy("source").agg(
        F.min("n_docs").cast("bigint").alias("n_docs"),
        F.min("target").cast("bigint").alias("target"),
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


@register(
    "docs_bigram_novelty",
    """
WITH toks AS (
  SELECT doc_id, w, CAST(k AS BIGINT) AS k FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS k
    FROM documents
  ) t WHERE regexp_matches(w, '^[a-z]+$')
),
seq AS (
  SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY k) AS r
  FROM toks
),
dbig AS (
  SELECT DISTINCT a.doc_id, a.w AS w1, b.w AS w2
  FROM seq a JOIN seq b ON a.doc_id = b.doc_id AND b.r = a.r + 1
),
firsts AS (
  SELECT w1, w2, MIN(doc_id) AS first_doc FROM dbig GROUP BY w1, w2
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(COUNT(*) FILTER (WHERE f.first_doc = d.doc_id) AS BIGINT)
         AS n_first_seen,
       CAST(COUNT(*) FILTER (WHERE f.first_doc = d.doc_id) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty_ratio
FROM dbig d JOIN firsts f ON d.w1 = f.w1 AND d.w2 = f.w2
GROUP BY d.doc_id
""",
)
def docs_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram novelty under doc_id ingestion order — what
    fraction of a document's distinct word bigrams had never appeared in
    any earlier document. The corpus-diversity curve this traces is the
    standard diminishing-returns diagnostic for continued crawling /
    dataset growth.

    Scale shape: distinct (doc, bigram) pairs from the window-free
    zip_with extraction (shared with docs_bigram_lm_score), a combinable
    MIN(doc_id) per bigram, and a bigram-keyed join back — both sides
    keyed identically so the first-occurrence relation and the per-doc
    membership co-partition under one shuffle scheme; nothing
    corpus-linear is broadcast. The ratio is exact-integer-over-integer.
    """
    docs = load_table(spark, sf_dir, "documents")
    dbig = (
        _word_bigram_pairs(docs).distinct().localCheckpoint(eager=True)
    )
    firsts = dbig.groupBy("w1", "w2").agg(
        F.min("doc_id").alias("first_doc")
    )
    j = dbig.join(firsts, ["w1", "w2"])
    new = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
        new.cast("bigint").alias("n_first_seen"),
        (new.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "novelty_ratio"
        ),
    )


@register("docs_bpe_compression", _ora_text.bpe_compression_oracle_sql())
def docs_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer lifecycle closed: train BPE (same 8 rounds as
    docs_bpe_vocab), ENCODE the corpus with the trained segmentation, and
    audit per-source compression — chars per token is the number a
    tokenizer team actually tracks per domain before committing a vocab.

    Scale shape: training runs over the vocabulary-sized dictionary
    (operators/bpe.py); encoding never re-segments the corpus — each
    corpus token joins its word's PRE-SEGMENTED token count from the
    trained dictionary (word-keyed join, dictionary side vocab-bounded
    but not broadcast-hinted), then one combinable per-source aggregate.
    All audited quantities are exact BIGINTs; the ratio is the only
    double."""
    from .operators.bpe import train_bpe, word_dictionary

    docs = load_table(spark, sf_dir, "documents")
    _merges, sym = train_bpe(
        word_dictionary(docs), n_merges=_ora_text.N_MERGES
    )
    wt = sym.select(
        "w", F.size("s").cast("bigint").alias("n_tokens")
    )
    corpus = docs.select(
        "source", F.explode(F.split("text", "\\s+")).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$"))
    return (
        corpus.join(wt, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("w")).cast("bigint").alias("total_chars"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (
                F.sum(F.length("w")).cast("double")
                / F.sum("n_tokens").cast("double")
            ).alias("chars_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# linear quality classifier (curation model scoring)
# ---------------------------------------------------------------------------

# Integer-scaled linear model over deterministic text features — stands in
# for a fastText-style quality classifier whose weights ship as literals
# with the pipeline. Score and features are exact integers, so the gate is
# a value check, and scoring is a pure projection (no shuffle, no UDF).
_QC_W_LEN = 8        # per token, saturated at 64 tokens
_QC_W_STOP = 3       # per mille of stopword tokens (fluency evidence)
_QC_W_DIGIT = -5     # per mille of digit chars (boilerplate/IDs penalty)
_QC_HIGH = 900
_QC_MED = 500


def _qc_sql() -> str:
    from .queries import _STOP_SQL

    return f"""
WITH feat AS (
  SELECT doc_id, lang,
         least(CAST(len(string_split(text, ' ')) AS BIGINT), 64) AS f_len,
         (1000 * CAST(len(list_filter(string_split(text, ' '),
                                      x -> x IN ({_STOP_SQL}))) AS BIGINT))
           // CAST(len(string_split(text, ' ')) AS BIGINT) AS f_stop_milli,
         (1000 * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT))
           // CAST(length(text) AS BIGINT) AS f_digit_milli
  FROM documents WHERE length(text) > 0
),
scored AS (
  SELECT lang,
         {_QC_W_LEN} * f_len + {_QC_W_STOP} * f_stop_milli
           + {_QC_W_DIGIT} * f_digit_milli AS score
  FROM feat
)
SELECT lang,
       CASE WHEN score >= {_QC_HIGH} THEN 'high'
            WHEN score >= {_QC_MED} THEN 'medium'
            ELSE 'low' END AS quality,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(score) AS BIGINT) AS min_score,
       CAST(MAX(score) AS BIGINT) AS max_score,
       CAST(SUM(score) AS BIGINT) AS sum_score
FROM scored GROUP BY 1, 2
"""


@register("docs_quality_classifier", _qc_sql())
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-scoring curation stage: an integer-weighted linear quality
    classifier (length saturation + stopword-fluency evidence - digit/
    boilerplate penalty) applied as a pure projection, then bucketed into
    high/medium/low and profiled per language.

    The shape every learned quality filter takes at 100 TB: weights are
    literals compiled into the plan (broadcast-free), features are
    scan-stage expressions, and the only shuffle is the final bounded
    groupBy over (lang, bucket). Swapping in real fastText/classifier
    weights changes the literals, not the plan. Feature arithmetic is
    exact integer (per-mille ratios via integer div), so the gate is a
    value-level hash check."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    f_len = F.least(
        F.expr("cast(size(split(text, ' ')) as bigint)"), F.lit(64)
    )
    f_stop = F.expr(
        f"(1000 * cast({_qc_stop_hits_expr()} as bigint))"
        " div cast(size(split(text, ' ')) as bigint)"
    )
    f_digit = F.expr(
        "(1000 * cast(length(regexp_replace(text, '[^0-9]', '')) as bigint))"
        " div cast(length(text) as bigint)"
    )
    score = (
        F.lit(_QC_W_LEN) * f_len
        + F.lit(_QC_W_STOP) * f_stop
        + F.lit(_QC_W_DIGIT) * f_digit
    )
    scored = docs.select(
        "lang",
        score.alias("score"),
    )
    quality = (
        F.when(F.col("score") >= _QC_HIGH, "high")
        .when(F.col("score") >= _QC_MED, "medium")
        .otherwise("low")
    )
    return (
        scored.withColumn("quality", quality)
        .groupBy("lang", "quality")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("score").cast("bigint").alias("min_score"),
            F.max("score").cast("bigint").alias("max_score"),
            F.sum("score").cast("bigint").alias("sum_score"),
        )
    )


def _qc_stop_hits_expr() -> str:
    """SQL-expression form of functions/text.py:hits for EN stopwords."""
    from .functions.text import EN_STOPWORDS

    arr = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"size(filter(split(text, ' '), x -> x IN ({arr})))"


# ---------------------------------------------------------------------------
# Retrieval / sampling (round 5b)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "vector", "slow", "window")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "docs_bm25_topk",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*)::BIGINT FROM documents) AS n,
         (SELECT sum(dl)::BIGINT FROM dl) AS t
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
  WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           (1000000::HUGEINT * (2*s.n - 2*df.df + 1) * 36 * s.t * tf.tf)
           // ((2*df.df + 1)::HUGEINT
               * (16*s.t*tf.tf + 5*s.t + 15*dl.dl*s.n))
         )::BIGINT AS bm25_scaled,
         count(*)::BIGINT AS n_terms
  FROM tf JOIN dl USING (doc_id) JOIN df USING (term), stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, bm25_scaled, n_terms FROM scored
ORDER BY bm25_scaled DESC, doc_id ASC LIMIT 5
""",
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 retrieval for a fixed 4-term query over the documents
    corpus — the lexical ranking function behind every production search
    / RAG-retrieval tier, with Okapi parameters k1=5/4, b=3/4 (exact
    binary fractions).

    Exactness: the per-term score idf·tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
    is cleared of ALL divisions by multiplying through by 16·T (T = total
    corpus tokens): numerator 36·T·tf·(2N−2df+1), denominator
    (2df+1)·(16·T·tf + 5·T + 15·dl·N) — exact integers in decimal(38,0)
    (HUGEINT on the oracle; products reach ~1e22, past int64), combined
    with ONE integral division per (doc,term) quantized to 1e6 units
    (floor — same truncation both engines), then summed as BIGINT. The
    idf is the repo's linear (N−df+½)/(df+½) — log() is libm-dependent
    in the last ulp (docs_tfidf_top_terms sets the precedent).

    Scale shape: dl is one combinable count per doc; T derives from dl
    (no second corpus pass); tf/df exist ONLY for the 4 query terms —
    the filter lands directly on the exploded stream, so the scoring
    join is query-bounded, df (≤4 rows) and the 1-row stats broadcast,
    and the top-5 is a TakeOrderedAndProject, never a global sort."""
    return bm25_topk(load_table(spark, sf_dir, "documents"))


def bm25_topk(
    d: DataFrame, terms: tuple = _BM25_TERMS, k: int = 5
) -> DataFrame:
    """Operator form of docs_bm25_topk (shared with the 10x scale probe,
    tests/test_scale_probe.py) — see the query docstring for the exact
    all-integer scoring derivation."""
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    dl = (
        toks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
        .localCheckpoint(eager=True)
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    stats = n_docs.crossJoin(
        F.broadcast(dl.agg(F.sum("dl").cast("bigint").alias("t")))
    )
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    dec = "decimal(38,0)"
    num = (
        F.lit(1000000).cast(dec)
        * (2 * F.col("n") - 2 * F.col("df") + 1)
        * 36
        * F.col("t")
        * F.col("tf")
    )
    den = (2 * F.col("df") + 1).cast(dec) * (
        16 * F.col("t") * F.col("tf")
        + 5 * F.col("t")
        + 15 * F.col("dl") * F.col("n")
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            num.alias("num"),
            den.alias("den"),
        )
        .select(
            "doc_id", F.expr("CAST(num div den AS BIGINT)").alias("contrib")
        )
        .groupBy("doc_id")
        .agg(
            F.sum("contrib").cast("bigint").alias("bm25_scaled"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
    )
    return scored.orderBy(
        F.desc("bm25_scaled"), F.asc("doc_id")
    ).limit(k)


@register(
    "docs_negative_sampling",
    """
WITH anchors AS (
  SELECT doc_id AS anchor_id, source AS a_src FROM documents
  WHERE doc_id % 20 = 0
),
cands AS (
  SELECT doc_id AS cand_id, source AS c_src,
         (doc_id * 2654435761) % 8 AS bucket
  FROM documents
),
paired AS (
  SELECT a.anchor_id, c.cand_id, c.c_src,
         (((a.anchor_id % 1000000007) * 97
           + (c.cand_id % 1000000007) * 31) % 1000000007
          * 2654435761) % 9973 AS h
  FROM anchors a JOIN cands c
    ON c.bucket = (a.anchor_id * 2654435761) % 8
  WHERE c.cand_id <> a.anchor_id AND c.c_src <> a.a_src
),
ranked AS (
  SELECT anchor_id, cand_id, c_src, h,
         row_number() OVER (PARTITION BY anchor_id ORDER BY h, cand_id)
           AS rn
  FROM paired
)
SELECT anchor_id, CAST(rn AS BIGINT) AS rn, cand_id AS neg_id,
       c_src AS neg_source, CAST(h AS BIGINT) AS h
FROM ranked WHERE rn <= 3
""",
)
def docs_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive training:
    for each anchor document, draw 3 pseudo-random negatives from OTHER
    sources (same-source docs are excluded as likely near-duplicates —
    the standard in-batch-negative contamination guard).

    Scale shape: the naive formulation is an anchors × corpus cross
    join; here candidates are pre-bucketed by a multiplicative hash
    (B=8) and each anchor probes exactly its own bucket — a plain keyed
    join whose fan-out is |corpus|/B per anchor, with B scaled up at
    higher SF (B≈corpus/1e4 keeps per-anchor work constant). The
    per-pair priority is an overflow-safe mod-p mix (operands stay
    under 2^63 at ANY key magnitude: reduce mod 1e9+7 BEFORE the
    multiplies — the queries_quality.py CUSUM lesson), then a
    row_number window per anchor picks the 3 smallest: one shuffle on
    anchor_id, map-side WindowGroupLimit prunes the rest."""
    d = load_table(spark, sf_dir, "documents")
    anchors = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("a_src"),
        ((F.col("doc_id") * 2654435761) % 8).alias("bucket"),
    )
    cands = d.select(
        F.col("doc_id").alias("cand_id"),
        F.col("source").alias("c_src"),
        ((F.col("doc_id") * 2654435761) % 8).alias("bucket"),
    )
    M = 1000000007
    h = (
        (
            (F.col("anchor_id") % M) * 97 + (F.col("cand_id") % M) * 31
        )
        % M
        * 2654435761
    ) % 9973
    paired = (
        anchors.join(cands, "bucket")
        .filter(
            (F.col("cand_id") != F.col("anchor_id"))
            & (F.col("c_src") != F.col("a_src"))
        )
        .select("anchor_id", "cand_id", "c_src", h.alias("h"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.asc("h"), F.asc("cand_id")
    )
    return (
        paired.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            "anchor_id",
            "rn",
            F.col("cand_id").alias("neg_id"),
            F.col("c_src").alias("neg_source"),
            F.col("h").cast("bigint").alias("h"),
        )
    )


@register(
    "docs_boolean_retrieval",
    """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
hits AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS BIGINT)
           AS c_join,
         CAST(sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) AS BIGINT)
           AS c_vector,
         CAST(sum(CASE WHEN term = 'slow' THEN 1 ELSE 0 END) AS BIGINT)
           AS c_slow
  FROM toks
  WHERE term IN ('join', 'vector', 'slow')
  GROUP BY doc_id
)
SELECT doc_id, c_join, c_vector, c_slow
FROM hits
WHERE c_join > 0 AND c_vector > 0 AND c_slow = 0
""",
)
def docs_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean inverted-index retrieval: docs matching the query
    ``join AND vector AND NOT slow`` — the posting-list set algebra that
    precedes ranked retrieval (docs_bm25_topk is the ranked tier over
    the same index).

    Shape: the term filter lands on the exploded stream (only the three
    query terms' postings survive the map side), one combinable
    conditional-count aggregate per doc builds all three posting
    membership counts in a single shuffle, and the AND/AND-NOT predicate
    is a residual filter on the aggregate — intersection and negation
    never materialize separate posting lists or join them. The NOT term
    costs nothing extra: its count is just another conditional sum that
    must be zero."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    hits = (
        toks.filter(F.col("term").isin("join", "vector", "slow"))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("term") == t, 1).otherwise(0))
                .cast("bigint")
                .alias(f"c_{t}")
                for t in ("join", "vector", "slow")
            ]
        )
    )
    return hits.filter(
        (F.col("c_join") > 0)
        & (F.col("c_vector") > 0)
        & (F.col("c_slow") == 0)
    )


# ---------------------------------------------------------------------------
# data-mixing queries (round 5c): language-balanced sampling + DSIR-style
# importance resampling — the two selection passes that sit between dedup
# and packing in a training-data pipeline.
# ---------------------------------------------------------------------------

_LANG_CAP = 75  # per-lang quota: caps the head (en) and passes tail langs whole
# at BOTH gate scales (sf0.001 min-lang 71, sf0.01 min-lang 64)


def _lang_balanced_oracle_sql() -> str:
    from .functions.text import md5_hash48_sql

    h = md5_hash48_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT lang, doc_id, rn FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang ORDER BY {h}, doc_id
         ) AS rn
  FROM documents
) t
WHERE rn <= {_LANG_CAP}
"""


@register("docs_language_balanced_sample", _lang_balanced_oracle_sql())
def docs_language_balanced_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language quota sampling — cap every language at ``_LANG_CAP``
    docs, chosen by a deterministic portable hash of doc_id (a seedless
    stand-in for a seeded uniform draw). This is the language-rebalancing
    pass of a multilingual data mix: head languages (en here, 3x any other)
    are downsampled to the quota while tail languages pass through whole —
    both branches exercised at gate scale.

    Scale shape: the rank<=K filter over a per-lang hash-ordered window is
    exactly the pattern Spark 4 rewrites to WindowGroupLimit — a MAP-SIDE
    partial top-K per language before the shuffle, so the exchange carries
    at most K rows per language per input partition, not the corpus. The
    head-language skew that makes naive per-group windows fall over (one
    reducer sorts all of en) is therefore bounded by construction. The
    hash is md5-derived (functions/text.py:md5_hash48) so the draw is
    engine-portable and the gate is exact.
    """
    from pyspark.sql.window import Window

    from .functions.text import md5_hash48

    docs = load_table(spark, sf_dir, "documents")
    h = md5_hash48(F.col("doc_id").cast("string")).alias("h")
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.select("lang", "doc_id", h)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _LANG_CAP)
        .select("lang", "doc_id", "rn")
    )


_DSIR_BUCKETS = 256
_DSIR_TOPK = 100
_DSIR_TARGET = "src0"


def _dsir_oracle_sql() -> str:
    from .functions.text import md5_hash48_sql

    h = md5_hash48_sql("w")
    return f"""
WITH toks AS (
  SELECT doc_id, source, w, ({h}) % {_DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, source, unnest(string_split_regex(text, '\\s+')) AS w
    FROM documents
  ) raw
  WHERE regexp_matches(w, '^[a-z]+$')
),
qc AS (SELECT b, COUNT(*) AS cnt_q FROM toks GROUP BY b),
tc AS (SELECT b, COUNT(*) AS cnt_t FROM toks
       WHERE source = '{_DSIR_TARGET}' GROUP BY b),
tot AS (
  SELECT (SELECT CAST(SUM(cnt_q) AS HUGEINT) FROM qc) AS n_q,
         (SELECT CAST(SUM(cnt_t) AS HUGEINT) FROM tc) AS n_t
),
weights AS (
  SELECT qc.b,
         CAST((CAST(COALESCE(tc.cnt_t, 0) AS HUGEINT) * tot.n_q * 1000000)
              // (CAST(qc.cnt_q AS HUGEINT) * tot.n_t) AS BIGINT) AS w_ppm
  FROM qc LEFT JOIN tc ON qc.b = tc.b, tot
),
scored AS (
  SELECT toks.doc_id, SUM(w.w_ppm) AS score_ppm, COUNT(*) AS n_tokens
  FROM toks JOIN weights w ON toks.b = w.b
  GROUP BY toks.doc_id
)
SELECT doc_id, score_ppm, n_tokens
FROM scored
ORDER BY score_ppm DESC, doc_id ASC
LIMIT {_DSIR_TOPK}
"""


@register("docs_dsir_importance_resample", _dsir_oracle_sql())
def docs_dsir_importance_resample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every corpus
    document by how much its hashed-unigram feature distribution looks
    like a TARGET domain (here source='src0' as the in-domain proxy), and
    keep the top-K. The canonical statistic is a sum of log probability
    ratios; this engine's transcendental-free substitute is the exact
    integer-ppm frequency ratio floor(cnt_target[b] * N_corpus * 1e6 /
    (cnt_corpus[b] * N_target)) summed per document — the same monotone
    target-vs-corpus contrast, bit-portable across engines.

    Scale shape: one corpus-linear tokenize/explode feeding two map-side
    combinable bucket counts (the feature space is FIXED at
    ``_DSIR_BUCKETS`` buckets, so both aggregates and the weight table are
    bounded regardless of corpus size or vocabulary drift); the weight
    table (<=256 rows) is a legitimate broadcast — bounded by
    construction, not by data luck; the per-doc score is one more
    combinable groupBy; top-K is a global orderBy+limit (partial take).
    Ratio arithmetic rides decimal(38,0) (HUGEINT on the oracle side) so
    the cross-multiplication cannot wrap at any corpus size; the summed
    per-doc score is bigint with ~2^20 ppm x doc_len headroom.
    """
    from .functions.text import md5_hash48

    docs = load_table(spark, sf_dir, "documents")
    # tokenize + hash ONCE: the token relation feeds the corpus count,
    # the target count AND the scoring join — without the checkpoint the
    # plan re-scans and re-tokenizes the corpus per branch (5 scans in
    # the audit; 1 after)
    toks = (
        docs.select(
            "doc_id",
            "source",
            F.explode(
                F.filter(
                    F.split("text", "\\s+"), lambda w: w.rlike("^[a-z]+$")
                )
            ).alias("w"),
        )
        .withColumn("b", md5_hash48(F.col("w")) % _DSIR_BUCKETS)
        .select("doc_id", "source", "b")  # raw token pruned pre-materialize
        .localCheckpoint(eager=True)
    )
    qc = toks.groupBy("b").agg(F.count("*").alias("cnt_q"))
    tc = (
        toks.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.count("*").alias("cnt_t"))
    )
    dec = "decimal(38,0)"
    totals = qc.agg(F.sum("cnt_q").cast(dec).alias("n_q")).crossJoin(
        tc.agg(F.sum("cnt_t").cast(dec).alias("n_t"))
    )
    weights = (
        qc.join(tc, "b", "left")
        .na.fill({"cnt_t": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.expr(
                f"CAST(CAST(cnt_t AS {dec}) * n_q * 1000000 AS {dec}) div "
                f"CAST(CAST(cnt_q AS {dec}) * n_t AS {dec})"
            )
            .cast("bigint")
            .alias("w_ppm"),
        )
    )
    scored = (
        toks.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("w_ppm").alias("score_ppm"),
            F.count("*").alias("n_tokens"),
        )
    )
    return (
        scored.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
        .limit(_DSIR_TOPK)
        .select("doc_id", "score_ppm", "n_tokens")
    )


_CCNET_MAX_SAMPLE = 4096  # cutoff-sample bound (same contract as ANN trainers)


def _ccnet_oracle_sql() -> str:
    return _LM_SCORED_CTES + f""",
mm AS (
  SELECT GREATEST(1, (COUNT(*) + {_CCNET_MAX_SAMPLE - 1})
                     // {_CCNET_MAX_SAMPLE}) AS m
  FROM documents
),
samp AS (SELECT scored.* FROM scored, mm WHERE doc_id % mm.m = 0),
ranked AS (
  SELECT score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
  FROM samp
),
ns AS (SELECT COUNT(*) AS n FROM samp),
cuts AS (
  SELECT MAX(score) AS cut_head, MIN(score) AS cut_mid
  FROM ranked, ns
  WHERE rk = GREATEST(1, ns.n // 3) OR rk = GREATEST(1, 2 * ns.n // 3)
),
bucketed AS (
  SELECT s.doc_id, s.n_bigrams,
         CASE WHEN s.score >= c.cut_head THEN 'head'
              WHEN s.score >= c.cut_mid THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM scored s, cuts c
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM bucketed GROUP BY bucket
"""


@register("docs_ccnet_quality_buckets", _ccnet_oracle_sql())
def docs_ccnet_quality_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing (Wenzek et al. 2020):
    score every document under the corpus-trained bigram LM (same model
    and linear-probability statistic as docs_bigram_lm_score), derive the
    tertile score cutoffs from a BOUNDED deterministic sample, then bucket
    the whole corpus map-side against the broadcast cutoffs. This is the
    production CCNet shape: cutoffs come from a sample precisely so the
    corpus never needs a global sort by score.

    Scale shape: bigram extraction and scoring are the shared window-free
    pipeline of docs_bigram_lm_score; the cutoff sample is bounded at
    ``_CCNET_MAX_SAMPLE`` docs via the dynamic doc_id%m modulus (same
    bounded-collect contract as the ANN trainers — m is ONE scalar
    aggregate), so the only global window sorts <=4096 rows; bucketing is
    a broadcast of one 2-column cutoff row and a map-side CASE; the final
    aggregate has 3 groups. Cutoff comparisons are on exact double score
    values picked FROM the data (no computed quantile arithmetic), so the
    gate is engine-portable; ties at a cutoff go to the better bucket on
    both engines.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    m = max(1, -(-n_docs // _CCNET_MAX_SAMPLE))
    # one shared scoring definition with docs_bigram_lm_score; the
    # checkpoint is because scored feeds BOTH the cutoff sample and the
    # final bucketing pass
    scored = _lm_scored(docs).localCheckpoint(eager=True)
    samp = scored.filter(F.col("doc_id") % m == 0)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = samp.select("score", F.row_number().over(w).alias("rk"))
    ns = samp.count()
    cuts = ranked.filter(
        (F.col("rk") == max(1, ns // 3))
        | (F.col("rk") == max(1, 2 * ns // 3))
    ).agg(
        F.max("score").alias("cut_head"),
        F.min("score").alias("cut_mid"),
    )
    bucketed = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_bigrams",
        F.when(F.col("score") >= F.col("cut_head"), "head")
        .when(F.col("score") >= F.col("cut_mid"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bigrams").alias("sum_bigrams"),
        F.sum("doc_id").alias("id_checksum"),
    )


@register(
    "docs_heaps_law",
    """
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok) t
  WHERE t.tok <> ''
),
first AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok),
mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
ks AS (SELECT unnest(range(1, 5)) AS k),
vocab AS (
  SELECT k, COUNT(*) AS vocab FROM first, mx, ks
  WHERE first_doc * 4 <= max_id * k GROUP BY k
),
nd AS (
  SELECT k, COUNT(*) AS n_docs FROM documents, mx, ks
  WHERE doc_id * 4 <= max_id * k GROUP BY k
)
SELECT CAST(vocab.k AS BIGINT) AS quartile,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(vocab AS BIGINT) AS vocab_size
FROM vocab JOIN nd ON vocab.k = nd.k
""",
)
def docs_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct-token count of each
    doc_id-order corpus prefix (quartile checkpoints of the id range) —
    the corpus-health diagnostic a training-data pipeline tracks to spot
    vocabulary saturation or duplication-driven collapse (a flat curve
    says new shards add no new language).

    Scale shape: NO global sort or window — a token's contribution to
    every checkpoint is fully determined by its FIRST occurrence, so one
    exploded-token groupBy (combinable MIN) computes first_doc per token,
    a 1-row max-id aggregate crossed with the 4-row checkpoint grid is
    broadcast onto it, and a 4-group conditional count finishes map-side.
    Exact integers end to end (first_doc*4 <= max_id*k avoids any
    fraction), so the gate is bit-portable at every SF."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    mx = d.agg(F.max("doc_id").alias("max_id"))
    ks = spark.range(1, 5).select(F.col("id").cast("int").alias("k"))
    grid = mx.crossJoin(ks)
    vocab = (
        first.crossJoin(F.broadcast(grid))
        .filter(F.col("first_doc") * 4 <= F.col("max_id") * F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    ndocs = (
        d.select("doc_id")
        .crossJoin(F.broadcast(grid))
        .filter(F.col("doc_id") * 4 <= F.col("max_id") * F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return vocab.join(ndocs, "k").select(
        F.col("k").cast("bigint").alias("quartile"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("vocab").cast("bigint").alias("vocab_size"),
    )


@register(
    "docs_quality_calibration",
    """
WITH r AS (
  SELECT least(n_chars, 2000) * 1000000 // 2000 AS score_ppm,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents
),
b AS (
  SELECT least((score_ppm * 10) // 1000000, 9) AS bin, score_ppm, label FROM r
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(score_ppm) AS BIGINT) AS sum_score_ppm,
       CAST(SUM(label) AS BIGINT) AS n_pos,
       CAST(SUM(label) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm
FROM b GROUP BY bin
""",
)
def docs_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION AUDIT for a quality scorer — the reliability-diagram
    aggregation every learned quality/toxicity filter needs before its
    scores gate a 100 TB corpus: bucket documents by score decile and
    compare each bin's mean score against its observed positive rate
    (a well-calibrated scorer has the two track each other). The scorer
    here is a deterministic heuristic (length saturation, exact integer
    ppm: least(n_chars, 2000) * 10^6 div 2000) and the label is a
    deterministic proxy (lang = 'en'), so the AGGREGATION MACHINERY —
    binning, exact ppm ratios, per-bin counts — is what the hash gate
    pins; swap in model scores and human labels and the query is a
    production calibration job unchanged. All ratios are integer
    divisions (div / //), never float division + cast: at 10^11-row
    scale a 1-ulp double boundary would flip a truncation.

    Scale shape: one map-only projection (score, label, bin) feeding one
    combinable 10-group aggregate — map-side partials do all the work,
    the shuffle carries 10 rows per task."""
    d = load_table(spark, sf_dir, "documents")
    score = F.expr("least(n_chars, 2000) * 1000000 div 2000")
    rows = d.select(
        score.alias("score_ppm"),
        (F.col("lang") == "en").cast("bigint").alias("label"),
    )
    b = F.least(
        F.expr("(score_ppm * 10) div 1000000"), F.lit(9).cast("bigint")
    )
    return (
        rows.select(b.alias("bin"), "score_ppm", "label")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("score_ppm").cast("bigint").alias("sum_score_ppm"),
            F.sum("label").cast("bigint").alias("n_pos"),
            F.expr("sum(label) * 1000000 div count(1)")
            .cast("bigint")
            .alias("pos_rate_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (round 8): concat-and-chunk — the assembly step that
# turns a curated corpus into fixed-length training sequences. Reference
# scope: beyond the valuation pipeline; required of the engine by the
# LLM-data-pipeline mandate (SURVEY.md §6).
# ---------------------------------------------------------------------------

#: Training sequence length for the packing gates. Production uses 2k-8k;
#: the fixtures' ~55-token documents pack ~meaningfully at 64 (every
#: chunk straddles documents, both boundary branches exercised).
PACK_SEQ_LEN = 64


def _doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens) for every non-empty document — the ONE owner of
    the packing tier's tokenization rule (whitespace tokens, empty docs
    dropped); the full and incremental gates both build on it so the rule
    cannot diverge between them."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), " "))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def _pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + global exclusive token offset in the
    virtual concatenated stream (doc_id order) — the distributed prefix
    sum (operators/ranks.py), never a single-task global window."""
    from .operators.ranks import with_running_offset

    return with_running_offset(
        _doc_token_counts(spark, sf_dir),
        ["doc_id"],
        "n_tokens",
        "off",
        assert_total_order=True,
    )


def _span_select(offsets: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, off) -> the chunk-span manifest columns; the one
    owner of the chunk-boundary arithmetic for both span gates."""
    first = F.expr(f"off div {PACK_SEQ_LEN}")
    last = F.expr(f"(off + n_tokens - 1) div {PACK_SEQ_LEN}")
    return offsets.select(
        "doc_id",
        "n_tokens",
        "off",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first).alias("n_boundary_crossings"),
    )


def _pack_spans_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE len(string_split(text, ' ')) > 0
),
o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM d
)
SELECT doc_id, n_tokens, CAST(off AS BIGINT) AS off,
       CAST(off // {PACK_SEQ_LEN} AS BIGINT) AS first_chunk,
       CAST((off + n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT) AS last_chunk,
       CAST((off + n_tokens - 1) // {PACK_SEQ_LEN}
            - off // {PACK_SEQ_LEN} AS BIGINT) AS n_boundary_crossings
FROM o
"""


@register("docs_pack_doc_spans", _pack_spans_sql())
def docs_pack_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document placement in the concat-and-chunk training stream:
    global token offset (exclusive prefix sum over doc_id order), the
    first/last training chunk the document touches, and how many chunk
    boundaries split it. This row set IS the packing manifest a loader
    needs to slice documents into fixed-length sequences.

    Complements docs_pack_sequences (queries.py), which SHARDS the
    corpus first so each shard packs under an independent per-shard
    window: that layout is right when shards are the unit of training
    reproducibility. This tier is the other deployment shape — ONE
    canonical global stream (what you need when chunk ids must be stable
    across cluster sizes and match a sequential reference pipeline) —
    and therefore has to solve, not avoid, the global running total.

    The offset is the scale-interesting part: a global running total is
    the textbook single-task window, computed here as the two-pass
    distributed prefix sum (operators/ranks.py:with_running_offset —
    range exchange + partition-local vectorized cumsum + broadcast
    partition prefixes; driver traffic one scalar per partition). The
    hash gate pins EVERY document's offset, so a one-row drift anywhere
    in the cumsum machinery breaks it. All integers — no float anywhere.

    Scale shape at 100 TB: parallelism = range partition count at every
    step; the only Python is one Arrow-batched cumsum over int64."""
    return _span_select(_pack_offsets(spark, sf_dir))


def _pack_chunks_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE len(string_split(text, ' ')) > 0
),
o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM d
),
e AS (
  SELECT doc_id, n_tokens, off, t.c AS chunk_id
  FROM o, LATERAL (SELECT unnest(range(CAST(off // {PACK_SEQ_LEN} AS BIGINT),
    CAST((off + n_tokens - 1) // {PACK_SEQ_LEN} + 1 AS BIGINT))) AS c) t
)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc_id,
       MAX(doc_id) AS last_doc_id,
       CAST(SUM(LEAST((chunk_id + 1) * {PACK_SEQ_LEN}, off + n_tokens)
                - GREATEST(chunk_id * {PACK_SEQ_LEN}, off)) AS BIGINT)
         AS n_tokens
FROM e GROUP BY chunk_id
"""


@register("docs_sequence_pack", _pack_chunks_sql())
def docs_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk-side view of concat-and-chunk packing: one row per
    fixed-length training sequence with its document fan-in (how many
    docs contribute), the first/last contributing doc, and the exact
    token count (PACK_SEQ_LEN everywhere except the ragged tail) —
    i.e. the per-sequence manifest of the packed training set.

    Built from the same distributed offsets as docs_pack_doc_spans:
    each document explodes into only the chunks it overlaps (sequence()
    over its span — total explode volume is corpus_tokens/SEQ_LEN + one
    row per doc, NOT docs x chunks), then one combinable groupBy(chunk).
    The per-chunk token sum re-derives each doc's clipped contribution
    from (off, n_tokens), so the gate cross-checks the offsets against
    an independent arithmetic path."""
    o = _pack_offsets(spark, sf_dir)
    e = o.select(
        "doc_id",
        "n_tokens",
        "off",
        F.explode(
            F.sequence(
                F.expr(f"off div {PACK_SEQ_LEN}"),
                F.expr(f"(off + n_tokens - 1) div {PACK_SEQ_LEN}"),
            )
        ).alias("chunk_id"),
    )
    L = PACK_SEQ_LEN
    return (
        e.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
            F.sum(
                F.least(
                    (F.col("chunk_id") + 1) * L,
                    F.col("off") + F.col("n_tokens"),
                )
                - F.greatest(F.col("chunk_id") * L, F.col("off"))
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
        .select(
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            "n_docs",
            "first_doc_id",
            "last_doc_id",
            "n_tokens",
        )
    )


#: Incremental-packing split point: documents below are the "already
#: ingested" base corpus, at/above are today's delta. 400 keeps the
#: delta meaningful at every fixture scale (sf0.001/0.01 have 500 docs,
#: sf0.1 has 5000).
PACK_BASE_SPLIT = 400


@register("docs_pack_incremental", _pack_spans_sql())
def docs_pack_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL concat-and-chunk maintenance — the daily-ingest shape
    of docs_pack_doc_spans: the base corpus's offsets are already
    computed (and in production, persisted); a delta batch appends to
    the END of the virtual stream, so its offsets are just
    base_total + delta-local prefix sum. The base is NEVER re-scanned
    for its per-row offsets at delta time — only its one-scalar total
    crosses over (same warm-start contract as
    parts_copurchase_sssp_incremental: the incremental path must reach
    the exact full-recompute fixpoint, so the gate reuses the FULL-run
    oracle verbatim; appended streams make that exact, since earlier
    offsets cannot change).

    doc_id is the ingest order here; production uses (ingest_date,
    doc_id) — any total order in which deltas sort AFTER the base works,
    and that ordering discipline is precisely what makes packing
    incrementally maintainable at all."""
    from .operators.ranks import with_running_offset

    d = _doc_token_counts(spark, sf_dir)
    base = with_running_offset(
        d.filter(F.col("doc_id") < PACK_BASE_SPLIT),
        ["doc_id"],
        "n_tokens",
        "off",
        assert_total_order=True,
    ).localCheckpoint(eager=True)
    # the ONLY base-side state the delta needs: one scalar
    [tot] = base.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t")
    ).collect()
    delta = with_running_offset(
        d.filter(F.col("doc_id") >= PACK_BASE_SPLIT),
        ["doc_id"],
        "n_tokens",
        "off",
        assert_total_order=True,
    ).withColumn("off", F.col("off") + F.lit(int(tot["t"])))
    return _span_select(base.unionByName(delta))


#: Systematic-sample size: the number of evenly spaced ticks laid over
#: the cumulative-weight axis. Small enough that every fixture doc's
#: weight is well under one stride (multi-pick rows still occur when a
#: long doc straddles a tick).
SYSTEMATIC_K = 25


@register(
    "docs_weighted_systematic_sample",
    f"""
WITH t AS (
  SELECT CAST(SUM(n_chars) AS BIGINT) AS total FROM documents
  WHERE n_chars IS NOT NULL
),
o AS (
  SELECT doc_id, lang, n_chars,
         COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(((off + n_chars) * {SYSTEMATIC_K}) // total
            - (off * {SYSTEMATIC_K}) // total AS BIGINT) AS n_picks
FROM o, t
WHERE ((off + n_chars) * {SYSTEMATIC_K}) // total
      - (off * {SYSTEMATIC_K}) // total > 0
""",
)
def docs_weighted_systematic_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weight-proportional SYSTEMATIC sampling — the deterministic,
    engine-portable way to draw a size-k weight-proportional sample that
    the A-ES/Gumbel-key textbook methods cannot give you exactly
    (their keys are ``u^(1/w)`` / ``-ln(u)/w`` — transcendental, so no
    two engines agree bitwise). Lay k evenly spaced ticks over the
    cumulative-weight axis (tick m at m*total/k); a document is selected
    once per tick inside its span ``(off, off + w]``. Selection
    probability is proportional to weight, exactly k picks total, and
    the membership test is PURE INTEGER arithmetic:
    ``(cum*k) div total - (off*k) div total >= 1`` — no float, no RNG,
    identical on every engine (products bounded by total*k; at
    100 TB-scale totals route through DECIMAL the way
    functions/numeric.py already does for sums).

    The cumulative weight is the distributed prefix sum
    (operators/ranks.py:with_running_offset — range exchange +
    partition-local cumsum + broadcast partition prefixes), NOT a
    single-task global window; the corpus total is the one extra scalar.
    Same placement machinery as the packing tier, different consumer:
    this is the corpus-subsample/curriculum-draw primitive."""
    from .operators.ranks import with_running_offset

    k = SYSTEMATIC_K
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("w"))
    )
    # total from the PRE-offset frame: aggregating the operator's output
    # would re-execute its Arrow cumsum pass just to rediscover a sum the
    # totals job already produced
    [row] = d.agg(F.coalesce(F.sum("w"), F.lit(0)).alias("t")).collect()
    total = int(row["t"])
    off = with_running_offset(
        d, ["doc_id"], "w", "off", assert_total_order=True
    )
    picks = F.expr(f"((off + w) * {k}) div {total} - (off * {k}) div {total}")
    return (
        off.withColumn("n_picks", picks.cast("bigint"))
        .filter(F.col("n_picks") > 0)
        .select(
            "doc_id",
            "lang",
            F.col("w").alias("n_chars"),
            "n_picks",
        )
    )


#: Deterministic-shuffle key: multiplicative hash (engine-portable, no
#: RNG) — the same constant family as the sampling tier. The modulus is
#: prime and far above the fixture doc counts so the (hkey, doc_id) order
#: behaves like a random permutation at every scale.
SHUFFLE_MULT = 2654435761
SHUFFLE_MOD = 1000003


def _shuffled_spans_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         (doc_id * {SHUFFLE_MULT}) % {SHUFFLE_MOD} AS hkey
  FROM documents WHERE len(string_split(text, ' ')) > 0
),
o AS (
  SELECT doc_id, n_tokens, hkey,
         COALESCE(SUM(n_tokens) OVER (ORDER BY hkey, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
         CAST(row_number() OVER (ORDER BY hkey, doc_id) - 1 AS BIGINT)
           AS shuffle_pos
  FROM d
)
SELECT doc_id, CAST(shuffle_pos AS BIGINT) AS shuffle_pos, n_tokens,
       CAST(off AS BIGINT) AS off,
       CAST(off // {PACK_SEQ_LEN} AS BIGINT) AS first_chunk,
       CAST((off + n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT) AS last_chunk
FROM o
"""


@register("docs_shuffled_pack_spans", _shuffled_spans_sql())
def docs_shuffled_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL DETERMINISTIC SHUFFLE + concat-and-chunk placement — the
    missing first step of real training-data assembly: a training run
    never packs the corpus in ingest order; it packs a reproducible
    PERMUTATION of it. The permutation here is order-by-multiplicative-
    hash (hkey = doc_id * 2654435761 mod 1000003, doc_id tiebreak) — no
    RNG, no seed file, identical on every engine and every cluster size;
    each document gets its global shuffle position AND its token offset
    in the shuffled virtual stream, i.e. the manifest for packing the
    SHUFFLED corpus.

    Both global order statistics (position = rank, offset = weighted
    prefix sum) come from ONE pass of the distributed prefix-sum
    operator (operators/ranks.py) over the (hkey, doc_id) range
    partitioning — position is recovered as the exclusive prefix sum of
    weight 1 folded into the same cumsum pass's partition offsets, never
    a single-task global window. The oracle recomputes both with
    textbook SQL windows.

    At 100 TB: one range exchange on (hkey, doc_id); the hash key is
    computed scan-side so the range partitioner sees a uniform key
    space — the shuffle this query performs is exactly the shuffle its
    OUTPUT represents."""
    from .operators.ranks import with_running_offsets

    d = _doc_token_counts(spark, sf_dir).withColumn(
        "hkey", (F.col("doc_id") * SHUFFLE_MULT) % SHUFFLE_MOD
    )
    # both order statistics ride ONE range exchange / one cumsum pass:
    # prefix-sum of ones == zero-based global rank in (hkey, doc_id) order
    pos = with_running_offsets(
        d.withColumn("one", F.lit(1).cast("bigint")),
        ["hkey", "doc_id"],
        {"off": "n_tokens", "shuffle_pos": "one"},
        assert_total_order=True,
    )
    L = PACK_SEQ_LEN
    return pos.select(
        "doc_id",
        F.col("shuffle_pos").cast("bigint").alias("shuffle_pos"),
        "n_tokens",
        F.col("off").cast("bigint").alias("off"),
        F.expr(f"off div {L}").cast("bigint").alias("first_chunk"),
        F.expr(f"(off + n_tokens - 1) div {L}")
        .cast("bigint")
        .alias("last_chunk"),
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking with overlap (the RAG / context-window manifest)
# ---------------------------------------------------------------------------

#: Chunk window and stride (tokens). Stride < window => consecutive chunks
#: overlap by CHUNK_LEN - CHUNK_STRIDE tokens — the tokenizer
#: "return_overflowing_tokens with stride" convention every RAG indexer
#: and long-document training pipeline uses. The fixture's ~55-token docs
#: exercise both branches (single short chunk and multi-chunk overlap).
CHUNK_LEN = 48
CHUNK_STRIDE = 32


@register(
    "docs_chunk_overlap",
    f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
k AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens <= {CHUNK_LEN} THEN 0
              ELSE (n_tokens - {CHUNK_LEN} + {CHUNK_STRIDE} - 1)
                   // {CHUNK_STRIDE} END AS k_max
  FROM d
)
SELECT doc_id,
       CAST(t.k AS BIGINT) AS chunk_idx,
       CAST(LEAST(t.k * {CHUNK_STRIDE},
                  GREATEST(n_tokens - {CHUNK_LEN}, 0)) AS BIGINT)
         AS tok_start,
       CAST(LEAST({CHUNK_LEN}, n_tokens) AS BIGINT) AS chunk_len
FROM k, LATERAL (SELECT unnest(range(0, k_max + 1)) AS k) t
""",
)
def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sliding-window chunk manifest: fixed CHUNK_LEN-token
    windows every CHUNK_STRIDE tokens, the LAST window right-aligned to
    the document end (so every token is covered, every chunk is
    full-length when the document allows, and no redundant sub-window
    tail is emitted) — the within-document complement of the
    cross-document packing tier: packing concatenates docs into training
    chunks, this splits long docs into overlapping context windows (RAG
    indexing, long-doc pretraining with stride).

    All-integer arithmetic on the shared whitespace-token rule
    (_doc_token_counts' convention), so the manifest is hash-exact.

    Scale shape: ONE scan-side explode of (n - L + S - 1) div S + 1 rows
    per document — zero shuffle, zero Python; the manifest is the same
    size as the chunk store it describes. At 100 TB the chunk WRITE
    dominates; this plan adds nothing on top of the scan."""
    L, S = CHUNK_LEN, CHUNK_STRIDE
    d = _doc_token_counts(spark, sf_dir)
    k_max = F.when(F.col("n_tokens") <= L, F.lit(0)).otherwise(
        F.expr(f"(n_tokens - {L} + {S} - 1) div {S}")
    )
    return (
        d.withColumn("k_max", k_max)
        .select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0), F.col("k_max"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.least(
                F.col("chunk_idx") * S,
                F.greatest(F.col("n_tokens") - L, F.lit(0)),
            )
            .cast("bigint")
            .alias("tok_start"),
            F.least(F.lit(L), F.col("n_tokens"))
            .cast("bigint")
            .alias("chunk_len"),
        )
    )
