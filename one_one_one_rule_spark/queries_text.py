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
