"""DuckDB oracle-SQL generator for the BPE tokenizer-training query.

Same contract as oracles_ann.py: the trained artifact (the ordered merge
list) is re-derived engine-independently — the word dictionary comes from
DuckDB reading the same parquet, and a pure-Python sequential trainer
(collections.Counter + the classic left-to-right merge scan) learns the
merges with the identical deterministic tie-break. The generated SQL then
re-EXECUTES the application side independently: it rebuilds the word
dictionary in SQL, re-applies each learned merge with a recursive-CTE
left-to-right scan over space-joined symbol strings (the scan keeps the
consumed trailing separator as the next leading separator, so adjacent
merge sites chain exactly like the array fold in operators/bpe.py), and
re-aggregates the weighted sub-word vocabulary.

A wrong merge learned by the distributed Spark trainer at ANY round
produces a different final vocabulary → hash mismatch, so the gate checks
the whole training loop, not just the final aggregate.

Generators return ``None`` (→ rows-only fallback) if the gate-scale
parquet is unavailable.
"""

from __future__ import annotations

import os
from collections import Counter

from .oracles_ann import GENERATORS

GATE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)

N_MERGES = 8

# single source of truth for the tokenization both engines must share
_WORD_DICT_SQL = """
SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w FROM {docs}
) t WHERE regexp_matches(w, '^[a-z]+$')
GROUP BY w
"""


from functools import lru_cache


@lru_cache(maxsize=8)
def train_bpe_reference(
    sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Sequential pure-Python BPE trainer over the DuckDB word dict —
    the engine-independent reference implementation the distributed
    trainer (operators/bpe.py:train_bpe) must reproduce exactly.

    Memoized per (sf_dir, n_merges): BOTH generated oracles (vocab and
    compression) need the identical merge list at registry-import time —
    without the cache each import would scan the parquet and train
    twice."""
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        _WORD_DICT_SQL.format(docs=f"'{sf_dir}/documents.parquet'")
    ).fetchall()
    con.close()
    dict_ = {w: (list(w), f) for w, f in rows}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, f in dict_.values():
            for k in range(len(syms) - 1):
                pc[(syms[k], syms[k + 1])] += f
        if not pc:
            break
        (x, y), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((x, y, cnt))
        for w, (syms, f) in dict_.items():
            out, k = [], 0
            while k < len(syms):
                if k + 1 < len(syms) and syms[k] == x and syms[k + 1] == y:
                    out.append(x + y)
                    k += 2
                else:
                    out.append(syms[k])
                    k += 1
            dict_[w] = (out, f)
    return merges


def _merge_chain_parts(
    merges: list[tuple[str, str, int]]
) -> tuple[list[str], str]:
    """Shared CTE chain: SQL word dict -> space-joined symbol strings ->
    one recursive-CTE left-to-right merge scan per learned rule. Returns
    (CTE parts, name of the final symbolized relation)."""
    parts = [
        "WITH w0 AS (" + _WORD_DICT_SQL.format(docs="documents") + "),",
        # ' c a t ' — leading/trailing separators so every token is
        # space-delimited on both sides
        "s0 AS (SELECT word, freq,"
        " ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' AS s"
        " FROM w0)",
    ]
    prev = "s0"
    for r, (x, y, _cnt) in enumerate(merges, 1):
        # tokens are ^[a-z]+$ by construction: safe as SQL literals and
        # unambiguous against the ' ' separator
        pat = f" {x} {y} "
        rep = f" {x}{y}"
        plen = len(pat)
        parts.append(
            f""",r{r} AS (
  WITH RECURSIVE walk AS (
    SELECT word, freq, '' AS done, s AS rest FROM {prev}
    UNION ALL
    SELECT word, freq,
           done || substr(rest, 1, strpos(rest, '{pat}') - 1) || '{rep}',
           substr(rest, strpos(rest, '{pat}') + {plen} - 1)
    FROM walk WHERE strpos(rest, '{pat}') > 0
  )
  SELECT word, freq, done || rest AS s FROM walk
  WHERE strpos(rest, '{pat}') = 0
),s{r} AS (SELECT word, freq, s FROM r{r})"""
        )
        prev = f"s{r}"
    return parts, prev


def bpe_vocab_oracle_sql(sf_dir: str | None = None) -> str | None:
    """Generated oracle for ``docs_bpe_vocab``: word dict in SQL, learned
    merges applied via chained recursive-CTE scans, vocabulary
    re-aggregated — only the merge rules are embedded literals."""
    sf_dir = sf_dir or GATE_SF_DIR
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        return None
    parts, prev = _merge_chain_parts(train_bpe_reference(sf_dir))
    parts.append(
        f"""
SELECT tok AS token, CAST(SUM(freq) AS BIGINT) AS n_weighted FROM (
  SELECT unnest(regexp_split_to_array(trim(s), ' ')) AS tok, freq
  FROM {prev}
) GROUP BY tok"""
    )
    return "\n".join(parts)


def bpe_compression_oracle_sql(sf_dir: str | None = None) -> str | None:
    """Generated oracle for ``docs_bpe_compression``: the same merge-CTE
    chain produces each word's trained segmentation; the corpus is then
    re-exploded WITH its source column, every token joins to its word's
    token count, and the per-source compression audit aggregates exact
    integers."""
    sf_dir = sf_dir or GATE_SF_DIR
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        return None
    parts, prev = _merge_chain_parts(train_bpe_reference(sf_dir))
    parts.append(
        f""",wt AS (
  SELECT word,
         CAST(len(regexp_split_to_array(trim(s), ' ')) AS BIGINT)
           AS n_tokens
  FROM {prev}
),
corpus AS (
  SELECT source, w FROM (
    SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS w
    FROM documents
  ) t WHERE regexp_matches(w, '^[a-z]+$')
)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(c.w)) AS BIGINT) AS total_chars,
       CAST(SUM(wt.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(length(c.w)) AS DOUBLE) / CAST(SUM(wt.n_tokens) AS DOUBLE)
         AS chars_per_token
FROM corpus c JOIN wt ON c.w = wt.word
GROUP BY c.source"""
    )
    return "\n".join(parts)


GENERATORS["docs_bpe_vocab"] = bpe_vocab_oracle_sql
GENERATORS["docs_bpe_compression"] = bpe_compression_oracle_sql
