"""BPE tokenizer training on the word-frequency table.

The byte-pair-encoding loop every modern tokenizer (GPT-2 BPE,
SentencePiece-BPE) starts from, restructured for Spark's execution
model: statistics live on the VOCABULARY table, not the corpus — the
caller pays one corpus-sized shuffle to build word frequencies, and
every merge round after that is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators._cache import query_scoped_cache


def bpe_merges(
    spark: SparkSession,
    word_freq: DataFrame,
    rounds: int = 3,
    replace_passes: int = 4,
    word_col: str = "w",
    count_col: str = "c",
) -> DataFrame:
    """Learn ``rounds`` BPE merges from a (word, count) table; returns a
    DataFrame (merge_rank int, sym_a, sym_b string, pair_count long).

    Each round counts adjacent symbol pairs weighted by word frequency,
    picks the most frequent pair (tiebreak: count desc, then pair
    lexicographic) and fuses it everywhere. The per-round argmax is a
    deliberate 1-ROW collect (bounded driver work — the same class as
    the k-means training sample in similarity.py); everything else is
    hash aggregation over the vocabulary. The merge application is
    ``replace_passes`` fixed non-overlapping ``replace`` passes over the
    space-padded symbol string — enough to reach the greedy-BPE fixpoint
    for any realistic word, and a pass count an external SQL oracle can
    mirror exactly.
    """
    merges = bpe_learn(
        spark, word_freq, rounds, replace_passes, word_col, count_col
    )
    return spark.createDataFrame(
        merges, "merge_rank int, sym_a string, sym_b string, pair_count long"
    )


def bpe_learn(
    spark: SparkSession,
    word_freq: DataFrame,
    rounds: int = 3,
    replace_passes: int = 4,
    word_col: str = "w",
    count_col: str = "c",
) -> list[tuple[int, str, str, int]]:
    """:func:`bpe_merges`'s learning loop, returning the merge list
    itself — ``[(rank, sym_a, sym_b, pair_count), ...]`` — for callers
    that go on to APPLY the merges (:func:`bpe_apply`)."""
    sym = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.col(word_col), "(.)", "$1 ")),
        F.lit(" "),
    )
    # Own the cache lifecycle: each round's argmax collect re-reads the
    # word-frequency table, so caching it is justified — and because the
    # result is a list of collected merge literals (no lineage back to
    # word_freq), it is safe to unpersist before returning rather than
    # leak executor storage for the session.
    word_freq = query_scoped_cache(word_freq)
    try:
        return _bpe_merge_rounds(spark, word_freq, rounds, replace_passes, word_col, count_col, sym)
    finally:
        word_freq.unpersist()


def bpe_apply(
    words: DataFrame,
    merges: list[tuple[int, str, str, int]],
    replace_passes: int = 4,
    word_col: str = "w",
    out_col: str = "s",
) -> DataFrame:
    """Apply learned merges to a WORD table (tokenizer encoding, the
    half every training pipeline runs after :func:`bpe_learn`): pad each
    word to its space-separated symbol string, then chain the same
    fixed non-overlapping ``replace`` passes as training, merge by merge
    in rank order. Runs on the vocabulary, not the corpus — encoding a
    document is then a dimension-sized equi-join on the word, so the
    per-token cost at 100 TB is a hash lookup, not a string rewrite.
    """
    sym = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.col(word_col), "(.)", "$1 ")),
        F.lit(" "),
    )
    s = sym
    for _rank, a, b, _cnt in sorted(merges):
        needle = F.lit(f" {a} {b} ")
        repl = F.lit(f" {a}{b} ")
        for _ in range(replace_passes):
            s = F.replace(s, needle, repl)
    return words.withColumn(out_col, s)


def _bpe_merge_rounds(spark, word_freq, rounds, replace_passes, word_col, count_col, sym):
    cur = word_freq.select(
        F.col(word_col).alias("w"), F.col(count_col).alias("c"), sym.alias("s")
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(rounds):
        toks = F.split(F.trim(F.col("s")), " ")
        # sequence(1, 0) would yield [1, 0] (negative step): guard 1-symbol words
        idxs = F.when(
            F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = cur.select(
            "c",
            F.explode(
                F.transform(
                    idxs,
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("a"),
                        F.element_at(toks, i + F.lit(1)).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        pc = pairs.groupBy("p.a", "p.b").agg(F.sum("c").alias("cnt"))
        top_rows = pc.orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()
        if not top_rows:  # vocabulary fully merged into single symbols
            break
        top = top_rows[0]
        merges.append((r + 1, top["a"], top["b"], int(top["cnt"])))
        needle = F.lit(f" {top['a']} {top['b']} ")
        repl = F.lit(f" {top['a']}{top['b']} ")
        s2 = F.col("s")
        for _ in range(replace_passes):
            s2 = F.replace(s2, needle, repl)
        cur = cur.select("w", "c", s2.alias("s"))
    return merges
