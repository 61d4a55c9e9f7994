"""Text analysis: tokenization, language-ID, quality, LM scoring, corpus statistics, training-data transforms.

Moved verbatim from the single-file catalog in the round-8 package
split; see _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403


@register(
    "q29_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                 / len(toks), 6) AS avg_token_len
    FROM t WHERE len(toks) > 0
    """,
)
def q29_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) per document."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    out = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast(
                "double"
            )
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )
    return out.filter(F.col("n_tokens") > 0)



@register(
    "q30_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             text,
             length(text) AS n_chars,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                 / n_chars, 6) AS punct_ratio,
           ROUND(CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a'))) AS DOUBLE)
                 / len(toks), 6) AS stopword_ratio,
           CAST(CASE WHEN len(toks) >= 10
                      AND CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)/n_chars <= 0.1
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM t WHERE len(toks) > 0 AND n_chars > 0
    """,
)
def q30_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword features + keep flag."""
    docs = load(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    out = docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    ).filter((F.col("n_tokens") > 0) & (F.col("n_chars") > 0))
    keep = (F.col("n_tokens") >= 10) & (F.col("punct_ratio") <= 0.1)
    return out.withColumn("keep", F.when(keep, 1).otherwise(0).cast("long"))



@register("q31_langid", oracle=_langid_oracle())
def q31_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language marker-token counts
    with fixed precedence, compared against the labeled lang.
    """
    docs = load(spark, sf_dir, "documents")
    guess = langid_guess(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        guess.alias("guess"),
        F.when(guess == F.col("lang"), 1).otherwise(0).cast("long").alias("correct"),
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@register(
    "q48_bpe_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
             AS n_distinct
    FROM documents
    """,
)
def q48_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-pre-tokenizer-style token counting (letter runs / digit runs /
    punctuation) — the no-vocab LLM token-budget proxy."""
    from noaa_ais_glue_lakehouse_spark.functions.text import bpe_ish_tokens

    docs = load(spark, sf_dir, "documents")
    toks = bpe_ish_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )



@register(
    "q71_normalize_stopwords",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, toks,
             list_filter(toks, x -> x NOT IN
               ('a','an','and','are','as','at','be','by','for',
                'in','is','it','of','on','or','the','to','with')) AS kept
      FROM t
    )
    SELECT doc_id,
           array_to_string(kept, ' ') AS normalized,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
    FROM f
    """,
)
def q71_normalize_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization: stopword removal (the cleaning step before
    quality scoring / fingerprinting), emitting the normalized text and
    the removed-token count. Pure JVM column expressions; verified
    byte-for-byte against the DuckDB list_filter oracle."""
    from noaa_ais_glue_lakehouse_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    kept = remove_stopwords(F.col("text"))
    return docs.select(
        "doc_id",
        F.array_join(kept, " ").alias("normalized"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    )



@register(
    "q91_vocab_top_tokens",
    oracle="""
    WITH t AS (
      SELECT UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY tok
    )
    SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 100
    """,
)
def q91_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-100 — the vocabulary/stopword
    derivation pass of a tokenizer-training pipeline. Explode + count is
    map-side combinable (the shuffle carries one row per distinct token
    per partition, not per occurrence); top-k with a token tiebreak is a
    TakeOrdered, no global sort materialized."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(100)
    )



@register(
    "q92_tfidf_top_terms",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: attaching the corpus count scalar (idf denominator) \u2014 O(|tf|) rows \u00d7 1, not a fallback",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), n AS (
      SELECT COUNT(*) AS n FROM documents
    ), s AS (
      SELECT tf.doc_id, tf.tok,
             ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n
    ), r AS (
      SELECT doc_id, tok, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok) AS rn
      FROM s
    )
    SELECT doc_id, tok, tfidf, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 3
    """,
)
def q92_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF top-3 terms. The document-frequency table is
    tiny relative to the corpus (|vocab| rows) and broadcasts; the
    row_number ranks over the 6dp-ROUNDED score on BOTH engines so float
    ulps in ln() can't reorder ties. Scale shape: one shuffle for tf
    (doc, token), one |vocab|-sized agg for df, one doc-partition window."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    s = tf.join(F.broadcast(df_), "tok").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        s.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf", "rn")
    )



@register(
    "q103_scrub_pii",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or call +1-555-867-5309 ref '
                  || CAST(doc_id * 98765 AS VARCHAR) AS raw
      FROM documents
    ),
    scrub AS (
      SELECT doc_id, raw,
             regexp_replace(
               regexp_replace(
                 regexp_replace(raw,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}', '<PHONE>', 'g'),
               '[0-9]{5,}', '<NUM>', 'g') AS scrubbed
      FROM synth
    )
    SELECT doc_id, md5(scrubbed) AS scrub_md5,
           CAST(length(raw) - length(scrubbed) AS BIGINT) AS chars_delta,
           CAST(CASE WHEN scrubbed <> raw THEN 1 ELSE 0 END AS BIGINT) AS changed
    FROM scrub
    """,
)
def q103_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the curation path: emails → <EMAIL>, phone-like
    groups → <PHONE>, long digit runs → <NUM> (functions/text.py scrub_pii,
    a pure regexp_replace chain — JVM-side, codegen, RE2-compatible
    patterns). The synthetic corpus contains no PII, so each document gets
    a deterministic doc_id-derived contact line appended IN BOTH ENGINES
    before scrubbing — the oracle value-checks the full transform via the
    md5 of the scrubbed text, not just counts. Row-local projection: no
    shuffle at any scale."""
    from noaa_ais_glue_lakehouse_spark.functions.text import scrub_pii

    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call +1-555-867-5309 ref "),
        (F.col("doc_id") * 98765).cast("string"),
    )
    scrubbed = scrub_pii(raw)
    return docs.select(
        "doc_id",
        F.md5(scrubbed.cast("binary")).alias("scrub_md5"),
        (F.length(raw) - F.length(scrubbed)).cast("long").alias("chars_delta"),
        F.when(scrubbed != raw, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "changed"
        ),
    )



@register(
    "q105_mixture_sample",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tokens_before
      FROM t
    ),
    kept AS (
      SELECT * FROM ranked
      WHERE tokens_before < CASE lang WHEN 'en' THEN 20000 ELSE 8000 END
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM kept GROUP BY lang
    """,
)
def q105_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining data-mixture assembly: cap each language at a TOKEN
    budget (20k for en, 8k otherwise here) — mixtures are specified in
    tokens, not row fractions. Ranking inside each class is md5(doc_id) —
    a deterministic shuffle every engine reproduces — and the greedy
    prefix under budget is kept (operators/training.py
    mixture_sample_to_budget). One class-key shuffle + one window pass;
    classes sample independently, so the plan holds at any corpus size."""
    from noaa_ais_glue_lakehouse_spark.operators.training import (
        mixture_sample_to_budget,
    )

    docs = load(spark, sf_dir, "documents")
    with_counts = docs.select(
        "doc_id", "lang", F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens")
    )
    kept = mixture_sample_to_budget(
        with_counts, "doc_id", "lang", "n_tokens", {"en": 20000}, default_budget=8000
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )



@register(
    "q106_gopher_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             len(toks) AS n_words,
             list_sum(list_transform(toks, x -> length(x))) AS sum_len,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha
      FROM t
    ),
    r AS (
      SELECT doc_id,
             CAST(n_words AS BIGINT) AS n_words,
             ROUND(CAST(sum_len AS DOUBLE) / n_words, 4) AS mean_word_len,
             ROUND(CAST(n_alpha AS DOUBLE) / n_words, 4) AS frac_alpha_words
      FROM s WHERE n_words > 0
    )
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                      AND mean_word_len BETWEEN 3.0 AND 10.0
                      AND frac_alpha_words >= 0.8
                     THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM r
    """,
)
def q106_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 A1.1): word count in
    [50, 100k], mean word length in [3, 10], ≥80% words containing an
    alphabetic character — the published heuristic pretraining filter,
    as native column expressions (functions/text.py gopher_word_stats).
    Row-local projection, no shuffle; every intermediate ratio is
    emitted so the oracle pins the arithmetic, not just the verdict."""
    from noaa_ais_glue_lakehouse_spark.functions.text import gopher_word_stats

    docs = load(spark, sf_dir, "documents")
    stats = gopher_word_stats(F.col("text"))
    return (
        docs.select(
            "doc_id",
            stats["n_words"].alias("n_words"),
            stats["mean_word_len"].alias("mean_word_len"),
            stats["frac_alpha_words"].alias("frac_alpha_words"),
            stats["passes"].cast("long").alias("passes"),
        )
        .filter(F.col("n_words") > 0)
    )



@register(
    "q116_training_corpus_assembly",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, lang, text, len(toks) AS n_tokens,
             ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / len(toks), 4) AS mean_len,
             ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                   AS DOUBLE) / len(toks), 4) AS frac_alpha
      FROM t WHERE len(toks) > 0
    ),
    q AS (
      SELECT doc_id, lang, text, n_tokens FROM g
      WHERE n_tokens BETWEEN 20 AND 100000
        AND mean_len BETWEEN 3.0 AND 10.0
        AND frac_alpha >= 0.8
    ),
    ex AS (
      SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text
    ),
    qq AS (
      SELECT q.doc_id, q.lang, q.n_tokens FROM q JOIN ex USING (doc_id)
    ),
    mix AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tokens_before
      FROM qq
    ),
    kept AS (
      SELECT doc_id, lang, n_tokens FROM mix
      WHERE tokens_before < CASE lang WHEN 'en' THEN 12000 ELSE 5000 END
    ),
    sp AS (
      SELECT doc_id, n_tokens,
             CASE WHEN frac < 0.05 THEN 'val'
                  WHEN frac < 0.10 THEN 'test'
                  ELSE 'train' END AS split
      FROM (
        SELECT *, CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)
                    / 4294967296.0 AS frac
        FROM kept
      )
    ),
    binned AS (
      SELECT split, n_tokens,
             CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 % 8 AS INT) AS shard,
             doc_id
      FROM sp
    ),
    packed AS (
      SELECT split, shard, n_tokens,
             CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY split, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / 512.0) AS BIGINT) AS bin_id
      FROM binned
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT (shard, bin_id)) AS BIGINT) AS n_bins
    FROM packed GROUP BY split
    """,
)
def q116_training_corpus_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP training-corpus assembly — the full path from raw corpus
    to trainer-ready windows, every stage the REAL operator: Gopher-rule
    quality filter (word/length/alpha bounds, adjusted min-words for this
    corpus) → exact dedup (min-id survivor) → token-budget mixture
    sampling per language → deterministic train/val/test split → per-split
    sequence packing into 512-token windows (group_cols packing so a val
    doc never shares a window with a train doc). Reported per split:
    documents, tokens, packed windows — the manifest a pretraining run
    starts from, hash-checked end-to-end against a single DuckDB CTE.

    Scale: quality/split stages are row-local; dedup shuffles on the text
    hash; mixture + packing are one window pass each on small keys. No
    stage materializes more than |docs| rows."""
    from noaa_ais_glue_lakehouse_spark.functions.text import gopher_word_stats
    from noaa_ais_glue_lakehouse_spark.operators.dedup import dedup_exact
    from noaa_ais_glue_lakehouse_spark.operators.training import (
        mixture_sample_to_budget,
        pack_sequences,
        train_val_test_split,
    )

    docs = load(spark, sf_dir, "documents")
    stats = gopher_word_stats(F.col("text"))
    quality = docs.select(
        "doc_id",
        "lang",
        "text",
        stats["n_words"].alias("n_tokens"),
        stats["mean_word_len"].alias("_mean"),
        stats["frac_alpha_words"].alias("_alpha"),
    ).filter(
        F.col("n_tokens").between(20, 100000)
        & F.col("_mean").between(3.0, 10.0)
        & (F.col("_alpha") >= 0.8)
    )
    # project the filter-only stats away BEFORE the dedup shuffle:
    # Catalyst cannot prune fields inside dedup_exact's min_by struct,
    # so _mean/_alpha (16 B/row) would otherwise ride the text-keyed
    # exchange (guide §2.3 — visible in plans/r11 before-dump op (8))
    deduped = dedup_exact(
        quality.select("doc_id", "lang", "text", "n_tokens"),
        ["text"],
        "doc_id",
    ).select("doc_id", "lang", "n_tokens")
    kept = mixture_sample_to_budget(
        deduped, "doc_id", "lang", "n_tokens", {"en": 12000}, default_budget=5000
    ).drop("tokens_before")
    split = train_val_test_split(kept, "doc_id", 0.05, 0.05)
    packed = pack_sequences(
        split,
        "doc_id",
        "n_tokens",
        context_tokens=512,
        n_shards=8,
        group_cols=["split"],
    )
    return packed.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("shard", "bin_id").cast("long").alias("n_bins"),
    )



@register(
    "q126_string_kernels",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+')[1] AS w1,
             list_last(string_split_regex(lower(trim(text)), '\\s+')) AS w2
      FROM documents
    )
    SELECT doc_id,
           levenshtein(w1, w2) AS edit_dist,
           reverse(w1) AS w1_rev,
           translate(w1, 'aeiou', '.....') AS w1_devoweled,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           left(w2, 3) AS w2_prefix,
           CAST(ascii(w1) AS BIGINT) AS w1_first_cp
    FROM t
    """,
)
def q126_string_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-kernel surface sweep: edit distance (fuzzy matching),
    reverse, translate (character-class scrubbing), zero-padded id
    rendering, prefix slice, codepoint probe — each a JVM codegen
    expression the cleaning/standardization layer leans on, pinned
    byte-for-byte against the oracle's implementations. Row-local, no
    shuffle."""
    ev = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    w1 = F.element_at(toks, 1)
    w2 = F.element_at(toks, -1)
    return ev.select(
        "doc_id",
        F.levenshtein(w1, w2).alias("edit_dist"),
        F.reverse(w1).alias("w1_rev"),
        F.translate(w1, "aeiou", ".....").alias("w1_devoweled"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.substring(w2, 1, 3).alias("w2_prefix"),
        F.ascii(w1).cast("long").alias("w1_first_cp"),
    )



@register(
    "q137_unigram_logprob",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: attaching the corpus (total, vocab-size) scalar to the token stream for LM smoothing",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''))
               AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ),
    totals AS (
      SELECT SUM(c) AS total, COUNT(*) AS v FROM vocab
    ),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             SUM(ln((v2.c + 1.0) / (tt.total + tt.v))) AS lp
      FROM toks t JOIN vocab v2 USING (tok) CROSS JOIN totals tt
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(lp / n_tokens, 6) AS avg_logprob
    FROM scored
    """,
)
def q137_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring without an external LM: a unigram
    language model fit on the corpus itself (add-one smoothed), each
    document scored by its mean token log-probability — the
    perplexity-proxy filter a curation pipeline applies when KenLM isn't
    on the cluster, and the exact aggregation shape (explode → broadcast
    vocab join → map-side-combinable log-sum) a real LM-scoring job
    uses. The vocab is |types|-sized and broadcast; the corpus-total
    scalar rides a literal-sized cross join. Log floats round to 6dp for
    cross-engine hash stability (same doubles in, same libm class
    out)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log((F.col("c") + 1.0) / (F.col("total") + F.col("v")))
            ).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("lp") / F.col("n_tokens"), 6).alias("avg_logprob"),
    )



@register(
    "q149_type_bitmask",
    oracle="""
    WITH m AS (
      SELECT user_id,
             CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                             WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                             ELSE 16 END AS mask,
             CAST(ts AS DATE) AS day
      FROM events
    )
    SELECT user_id,
           CAST(BIT_OR(mask) AS BIGINT) AS type_mask,
           CAST(BIT_COUNT(BIT_OR(mask)) AS BIGINT) AS n_distinct_types,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS days_active
    FROM m GROUP BY user_id
    """,
)
def q149_type_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregation: each event type one bit, BIT_OR folding a
    user's whole history into a single long whose popcount is the
    distinct-type count — the bitmap-index trick for set-membership
    rollups (a 64-slot vocabulary compresses 'which features has this
    entity touched' into 8 bytes, mergeable across partitions and days
    like a sketch, but exact). One map-side-combinable aggregation."""
    ev = load(spark, sf_dir, "events")
    mask = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(16)
    )
    m = ev.select("user_id", mask.alias("mask"), F.to_date("ts").alias("day"))
    return m.groupBy("user_id").agg(
        F.bit_or("mask").cast("long").alias("type_mask"),
        F.bit_count(F.bit_or("mask")).cast("long").alias("n_distinct_types"),
        F.countDistinct("day").cast("long").alias("days_active"),
    )



@register(
    "q163_pareto_frontier",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS spend_cents
      FROM events GROUP BY user_id
    ), b AS (
      SELECT n_events, MAX(spend_cents) AS best
      FROM u GROUP BY n_events
    ), f AS (
      SELECT n_events, best,
             MAX(best) OVER (ORDER BY n_events
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prior_best
      FROM b
    )
    SELECT u.user_id, u.n_events,
           CAST(u.spend_cents AS BIGINT) AS spend_cents
    FROM u JOIN f ON u.n_events = f.n_events AND u.spend_cents = f.best
    WHERE f.prior_best IS NULL OR f.best > f.prior_best
    """,
)
def q163_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (skyline) frontier: users not dominated on the
    (fewer-events, higher-spend) trade-off — the multi-objective data-
    selection operator behind "highest quality per token" corpus picks
    and efficiency frontiers generally. Instead of the O(n²)
    dominance self-join, the skyline reduces to a cumulative-max window:
    collapse to the per-x best y (map-side combinable), sort the
    |distinct x| frontier candidates once, keep x-values whose best y
    strictly exceeds every smaller-x best, then join winners back
    (broadcast — the frontier is tiny by construction). The corpus-sized
    stages are the two aggregates; the window touches |distinct x| rows
    only. Ties on the frontier keep all attaining users, so the result
    is set-deterministic with no arbitrary tiebreak."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("spend_cents"),
    )
    b = u.groupBy("n_events").agg(F.max("spend_cents").alias("best"))
    wf = Window.orderBy("n_events").rowsBetween(
        Window.unboundedPreceding, -1
    )
    f = (
        b.withColumn("prior_best", F.max("best").over(wf))
        .filter(
            F.col("prior_best").isNull()
            | (F.col("best") > F.col("prior_best"))
        )
        # disambiguate: b derives from u, so the join below is a self-join
        # by lineage — rename the frontier's key columns outright
        .select(
            F.col("n_events").alias("f_n_events"), F.col("best").alias("f_best")
        )
    )
    return u.join(
        F.broadcast(f),
        (F.col("n_events") == F.col("f_n_events"))
        & (F.col("spend_cents") == F.col("f_best")),
    ).select("user_id", "n_events", "spend_cents")



@register(
    "q164_lexical_diversity",
    oracle="""
    WITH t AS (
      SELECT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT source, tok, COUNT(*) AS n FROM t GROUP BY source, tok
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(n), 6) AS type_token_ratio,
           ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_fraction
    FROM c GROUP BY source
    """,
)
def q164_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: token count, vocabulary
    size, hapax legomena (once-only tokens) and the derived type-token /
    hapax ratios — the corpus-QA screen that separates natural prose
    (high diversity) from boilerplate and template spam (low TTR, low
    hapax fraction) before documents reach training. Two-stage
    aggregation: (source, token) counts pre-reduce map-side so the
    shuffle carries one row per distinct term per partition — never per
    occurrence — and the per-source reduce is |vocab|-sized. The same
    two-level shape as q91's vocabulary; the ratios are exact-count
    divisions rendered once at the end."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
    c = t.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        hapax.cast("long").alias("n_hapax"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("n"), 6
        ).alias("type_token_ratio"),
        F.round(
            hapax.cast("double") / F.count(F.lit(1)), 6
        ).alias("hapax_fraction"),
    )



@register(
    "q166_source_vocab_overlap",
    oracle="""
    WITH t AS (
      SELECT DISTINCT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), sz AS (
      SELECT source, COUNT(*) AS n FROM t GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_shared
      FROM t a JOIN t b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           CAST(sa.n AS BIGINT) AS vocab_a,
           CAST(sb.n AS BIGINT) AS vocab_b,
           CAST(i.n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(i.n_shared AS DOUBLE)
                 / (sa.n + sb.n - i.n_shared), 6) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.source_a
    JOIN sz sb ON sb.source = i.source_b
    """,
)
def q166_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap (Jaccard) between sources — the
    mixture-design diagnostic telling you whether two corpus slices are
    redundant (near-identical vocabularies) or complementary before
    weighting them (q105). The (source, token) presence set is
    DISTINCTed map-side; the only corpus-sized shuffle is that distinct.
    The overlap self-join is keyed on token — an equi-join over
    |vocab|x|sources| rows, NOT documents — and source< ordering halves
    the pair space; vocabulary sizes broadcast back onto the
    |source-pairs| result. At web scale the token join inherits the
    stopword hot keys, which is exactly what q107's skew audit flags and
    a salt (operators/skew.py) spreads."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    ).distinct()
    sz = t.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = t.select(F.col("source").alias("source_a"), "tok")
    b = t.select(F.col("source").alias("source_b"), F.col("tok").alias("tok_b"))
    inter = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H shapes not yet in the catalog: Q19 disjunctive predicates, Q13
# count-distribution, Q11 scalar-subquery HAVING, Q22 anti-join + global
# average gate (SURVEY 2.12 X97)
# ---------------------------------------------------------------------------



@register(
    "q177_source_token_entropy",
    oracle="""
    WITH t AS (
      SELECT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2
    ), s AS (
      SELECT source, SUM(n) AS tot FROM c GROUP BY 1
    )
    SELECT c.source,
           CAST(MAX(s.tot) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(-SUM((n / CAST(s.tot AS DOUBLE))
                      * ln(n / CAST(s.tot AS DOUBLE))) / ln(2.0), 6)
             AS entropy_bits
    FROM c JOIN s ON c.source = s.source
    GROUP BY c.source
    """,
)
def q177_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X104 — Shannon entropy (bits) of each source's unigram
    distribution: the one-number diversity/repetitiveness signal per
    corpus slice (boilerplate-heavy sources score low — prime dedup /
    downweight candidates before mixing, complementing q137's
    per-document LM score with a per-slice view).

    Two keyed shuffles: (source, token) counts, then per-source
    aggregation; per-source totals ride along as max(tot) instead of a
    second join. Entropy terms are exact count ratios; only the final
    sum is float (round 6 absorbs association-order noise).
    """
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("source"))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        c.withColumn("tot", tot)
        .groupBy("source")
        .agg(
            F.max("tot").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.round(
                -F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 6
            ).alias("entropy_bits"),
        )
    )



@register(
    "q182_bigram_logprob",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the vocab-size scalar attached to the bigram stream for add-one smoothing",
    oracle="""
    WITH lst AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS l
      FROM documents
    ), toks AS (
      SELECT doc_id, UNNEST(l) AS tok,
             UNNEST(range(1, len(l) + 1)) AS pos
      FROM lst
    ), bg AS (
      SELECT doc_id, tok AS w2,
             LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
      FROM toks
    ), bgn AS (SELECT doc_id, w1, w2 FROM bg WHERE w1 IS NOT NULL),
    c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bgn GROUP BY 1, 2),
    c1 AS (SELECT tok AS w1, COUNT(*) AS n1 FROM toks GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vocab FROM toks)
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(SUM(ln((c2.n2 + 1.0) / (c1.n1 + (SELECT vocab FROM v))))
                 / COUNT(*), 6) AS avg_logprob
    FROM bgn d
    JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
    JOIN c1 ON c1.w1 = d.w1
    GROUP BY d.doc_id
    """,
)
def q182_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X109 — corpus-bigram LM quality score: each document's mean
    add-one-smoothed conditional bigram log-probability
    ln((C(w1,w2)+1)/(C(w1)+|V|)) under the corpus's own statistics —
    the sequence-aware upgrade of q137's unigram score (word-salad text
    with plausible unigrams scores low here).

    Shape: one doc-keyed lag window extracts bigrams; corpus bigram and
    unigram tables are built once and equi-joined back (the n-gram keyed
    joins carry stopword-pair hot keys — q107's skew audit applies).
    Every count is exact-integer; only the final mean is float.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgn = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w2"),
            F.lag("tok").over(w).alias("w1"),
        )
        .where(F.col("w1").isNotNull())
    )
    c2 = bgn.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = toks.groupBy(F.col("tok").alias("w1")).agg(
        F.count(F.lit(1)).alias("n1")
    )
    v = toks.agg(
        F.countDistinct("tok").cast("double").alias("vocab")
    )
    return (
        bgn.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.log(
                        (F.col("n2") + 1.0)
                        / (F.col("n1") + F.col("vocab"))
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )



@register(
    "q184_mixture_temperature",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the token-total and weight-total scalars attached to the |sources|-sized mixture table",
    oracle="""
    WITH n AS (
      SELECT source,
             SUM(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> ''))) AS n_tokens
      FROM documents GROUP BY 1
    ), p AS (
      SELECT source, n_tokens,
             CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM n) AS share,
             pow(CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM n), 0.7)
               AS raw_w
      FROM n
    )
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(share, 6) AS natural_share,
           ROUND(raw_w / (SELECT SUM(raw_w) FROM p), 6) AS sampled_share,
           ROUND(raw_w / (SELECT SUM(raw_w) FROM p) / share, 6) AS upweight
    FROM p
    """,
)
def q184_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X111 — temperature-based mixture reweighting (alpha=0.7, the
    standard multilingual/multi-source sampling exponent): each slice's
    natural token share is flattened to share^alpha and renormalized,
    up-weighting small sources without letting any source dominate.
    Feeds q105's budgeted sampler with principled per-source budgets
    instead of hand-set ones.

    All heavy work is one per-source token-count aggregation; the
    normalizations are single-row broadcasts over a |sources|-sized
    table.
    """
    docs = load(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).alias("n_tokens")
    )
    tot = n.agg(F.sum("n_tokens").alias("_tot"))
    p = n.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_tot")).alias("share"),
        F.pow(
            F.col("n_tokens").cast("double") / F.col("_tot"), F.lit(0.7)
        ).alias("raw_w"),
    )
    wtot = p.agg(F.sum("raw_w").alias("_wtot"))
    return p.crossJoin(F.broadcast(wtot)).select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("share", 6).alias("natural_share"),
        F.round(F.col("raw_w") / F.col("_wtot"), 6).alias("sampled_share"),
        F.round(F.col("raw_w") / F.col("_wtot") / F.col("share"), 6).alias(
            "upweight"
        ),
    )


# ---------------------------------------------------------------------------
# Point-in-time SCD2 lookup and K-step ordered funnel (X112-X113)
# ---------------------------------------------------------------------------



@register(
    "q191_weighted_sample",
    oracle="""
    WITH k AS (
      SELECT doc_id, n_chars,
             -ln((CAST(CAST(concat('0x', substr(md5(concat('es|', CAST(doc_id AS VARCHAR))), 1, 13))
                       AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0)
             / n_chars AS key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
    FROM k ORDER BY key, doc_id LIMIT 100
    """,
)
def q191_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X118 — deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ExpJ form): each row draws u from a seeded
    md5 hash of its id (uniform in (0,1), identical in any engine),
    gets key = -ln(u)/w, and the k smallest keys are the sample —
    inclusion probability proportional to weight (n_chars: longer
    documents sampled more, the token-budget-aware doc sampler).

    Fully distributed: the per-row key is a row-local projection and
    the k smallest are a TakeOrdered (per-partition heaps + driver
    merge of k·|partitions| rows) — no global sort, no RNG state, and
    re-running on any partitioning returns the identical sample.
    """
    from noaa_ais_glue_lakehouse_spark.functions.hashing import hash_uniform

    docs = load(spark, sf_dir, "documents")
    u = hash_uniform(F.col("doc_id").cast("string"), "es|")
    key = -F.log(u) / F.col("n_chars")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").cast("long").alias("weight"),
                key.alias("_key"))
        .orderBy("_key", "doc_id")
        .limit(100)
        .drop("_key")
    )


# ---------------------------------------------------------------------------
# Incremental recompute planning, sequence completeness, cross-source dups
# (X119-X121)
# ---------------------------------------------------------------------------



@register(
    "q207_heldout_cross_entropy",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the (grand, vocab) scalar attached to the |vocab x sources| token table",
    oracle="""
    WITH t AS (
      SELECT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2
    ), g AS (
      SELECT tok, SUM(n) AS gn FROM c GROUP BY 1
    ), tot AS (
      SELECT SUM(n) AS grand,
             CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vocab
      FROM c
    ), st AS (
      SELECT source, SUM(n) AS sn FROM c GROUP BY 1
    )
    SELECT c.source,
           CAST(st.sn AS BIGINT) AS n_tokens,
           ROUND(-SUM((c.n / CAST(st.sn AS DOUBLE))
                      * ln((g.gn - c.n + 1.0)
                           / ((SELECT grand FROM tot) - st.sn
                              + (SELECT vocab FROM tot))))
                 / ln(2.0), 6) AS cross_entropy_bits
    FROM c
    JOIN g ON g.tok = c.tok
    JOIN st ON st.source = c.source
    GROUP BY c.source, st.sn
    """,
)
def q207_heldout_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X134 — held-out cross-entropy per corpus slice: each source's
    unigram distribution scored under the add-one-smoothed model of the
    REST of the corpus (leave-one-slice-out). The data-valuation signal
    behind mixture design: a slice scoring near the corpus entropy is
    redundant with the rest; a high-scoring slice carries novel
    distribution mass (and a suspiciously LOW one is likely duplicated
    wholesale into other slices). Complements q178's symmetric JSD with
    the directional, model-based view.

    The complement model needs no second pass: per-token complement
    count = global − own, so one (source, token) rollup plus a
    token-keyed join to the |vocab| global table covers every slice's
    held-out model simultaneously. Exact integer counts everywhere;
    logs only at the end.
    """
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = c.groupBy("tok").agg(F.sum("n").alias("gn"))
    tot = c.agg(
        F.sum("n").alias("grand"),
        F.countDistinct("tok").cast("double").alias("vocab"),
    )
    st = F.sum("n").over(Window.partitionBy("source"))
    scored = (
        c.withColumn("sn", st)
        .join(g, "tok")
        .crossJoin(F.broadcast(tot))
    )
    p_own = F.col("n") / F.col("sn").cast("double")
    p_comp = (F.col("gn") - F.col("n") + 1.0) / (
        F.col("grand") - F.col("sn") + F.col("vocab")
    )
    return scored.groupBy("source").agg(
        F.max("sn").cast("long").alias("n_tokens"),
        F.round(
            -F.sum(p_own * F.log(p_comp)) / F.log(F.lit(2.0)), 6
        ).alias("cross_entropy_bits"),
    )



@register(
    "q213_data_card",
    allow_non_equi="deliberate 1-row x 1-row cross joins: the vocab-size and top-lang scalars attached to the 1-row data-card aggregate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, n_chars,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    flat AS (SELECT UNNEST(l) AS tok FROM toks),
    langs AS (
      SELECT lang, COUNT(*) AS n FROM toks GROUP BY 1
    ),
    top_lang AS (
      SELECT lang FROM langs ORDER BY n DESC, lang LIMIT 1
    ),
    dups AS (
      SELECT COUNT(*) - COUNT(DISTINCT md5(array_to_string(l, ' ')))
        AS n_dup_docs
      FROM toks
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(l)) AS BIGINT) AS total_tokens,
           CAST((SELECT COUNT(DISTINCT tok) FROM flat) AS BIGINT)
             AS vocab_size,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           (SELECT lang FROM top_lang) AS top_lang,
           CAST((SELECT n_dup_docs FROM dups) AS BIGINT) AS n_dup_docs,
           ROUND(CAST(SUM(len(l)) AS DOUBLE) / COUNT(*), 6)
             AS mean_doc_tokens,
           ROUND(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS short_doc_rate
    FROM toks
    """,
)
def q213_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X140 — one-row corpus data card (the Datasheets-for-Datasets /
    data-card summary a curation run publishes next to its output):
    document and token volumes, vocabulary size, language spread with
    the dominant language, normalized-content duplicate count, mean
    document length and short-document rate.

    Everything reduces in two passes over the documents scan: one doc-
    grain aggregate (counts, sums, lang distinct, duplicate
    fingerprints) and one token-grain distinct for the vocabulary; the
    mode-of-language and scalar attachments are |langs|- and 1-row
    broadcasts. The duplicate count is over tokenized-normalized text
    (same canonicalization as q25's fingerprint), so byte-level noise
    doesn't hide duplicates.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        tokenize(F.col("text")).alias("l"),
    )
    vocab = (
        toks.select(F.explode("l").alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    top_lang = (
        toks.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.min_by(
                "lang", F.struct((-F.col("n")).alias("negn"), F.col("lang"))
            ).alias("top_lang")
        )
    )
    base = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("l")).cast("long").alias("total_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.md5(F.array_join("l", " ")))
        )
        .cast("long")
        .alias("n_dup_docs"),
        F.round(
            F.sum(F.size("l")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_doc_tokens"),
        F.round(
            F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("short_doc_rate"),
    )
    return (
        base.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(top_lang))
        .select(
            "n_docs",
            "total_tokens",
            "vocab_size",
            "n_langs",
            "top_lang",
            "n_dup_docs",
            "mean_doc_tokens",
            "short_doc_rate",
        )
    )



@register(
    "q215_zipf_slope",
    oracle="""
    WITH c AS (
      SELECT source, tok, COUNT(*) AS n FROM (
        SELECT source,
               UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                      x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n DESC, tok) AS rk
      FROM c
    ),
    pts AS (
      SELECT source, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
      FROM ranked WHERE rk <= 100
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6) AS zipf_slope
    FROM pts GROUP BY source
    """,
)
def q215_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X142 — Zipf-law fit per source: OLS slope of log-frequency on
    log-rank over each slice's top-100 tokens. Natural language sits
    near −1; machine-generated, template or keyword-stuffed slices
    deviate hard — a one-number distribution-shape screen that catches
    what per-document quality scores (q30/q106) miss at the slice
    level.

    The rank window runs over the |vocab x sources| rollup (same key as
    the counting shuffle); the regression is the exact closed-form
    moment ratio (q130's pattern) over ≤100 points per source. Slope
    only — the intercept is scale and adds nothing to the diagnostic.
    """
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "tok")
    pts = (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 100)
        .select(
            "source",
            F.log(F.col("rk").cast("double")).alias("x"),
            F.log(F.col("n").cast("double")).alias("y"),
        )
    )
    cnt = F.count(F.lit(1))
    return pts.groupBy("source").agg(
        cnt.cast("long").alias("n_points"),
        F.round(
            (cnt * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (cnt * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            6,
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Extension round 3 batch 2 (X143-X150): substring-level dedup, fuzzy
# linkage, ranked retrieval + eval, spatial KNN, model-eval statistics
# ---------------------------------------------------------------------------


@register(
    "q216_repeated_ngram_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source,
             md5(array_to_string(ts[i:i+7], ' ')) AS g
      FROM toks, UNNEST(generate_series(1, len(ts) - 7)) AS u(i)
      WHERE len(ts) >= 8
    ),
    shared AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hit AS (SELECT doc_id, source, g FROM grams JOIN shared USING (g)),
    base AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    SELECT b.source,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(f.c, 0) AS BIGINT) AS n_docs_with_shared_span,
           CAST(COALESCE(sg.c, 0) AS BIGINT) AS n_shared_grams
    FROM base b
    LEFT JOIN (SELECT source, COUNT(DISTINCT doc_id) AS c FROM hit
               GROUP BY source) f USING (source)
    LEFT JOIN (SELECT source, COUNT(DISTINCT g) AS c FROM hit
               GROUP BY source) sg USING (source)
    """,
)
def q216_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X143 — substring-level duplication audit (the Lee et al. 2022
    "Deduplicating Training Data" signal): positional 8-token shingles,
    flag every gram appearing in >= 2 distinct documents, report per
    source how many docs carry at least one cross-document repeated span
    and how many distinct shared grams touch the source. Complements
    q194 (document-HEAD fingerprints only) and q27/q211 (whole-doc /
    line-level): this catches verbatim spans at ANY offset.

    Plan shape: gram generation is a pure projection (sequence +
    transform + slice, all codegen — no shuffle, no Python); the only
    shuffles are the hash aggregation on the gram key and the semi-join
    back on the same key. At 100 TB you would swap md5 for xxhash64 to
    shrink the shuffle payload 4x; md5 is kept here because the DuckDB
    oracle must compute the identical key.
    """
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        repeated_span_grams,
    )

    docs = load(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    grams = repeated_span_grams(docs, "doc_id", "text", n=_SPAN_N)
    # Cross-document gram frequency as a count window on the SAME gram
    # stream (round 11, the q372 treatment): the former groupBy + semi-
    # join-back referenced the gram-generation subtree twice, and the
    # joined `hit` relation was then consumed by TWO separate distinct
    # rollups — the executed plan re-ran gram generation four times
    # (7 parquet scans). Mostly-unique gram keys make map-side partial
    # aggregation moot, so the window shuffles the same bytes the
    # aggregate did — minus the join-back and the re-evaluations.
    hit = (
        grams.withColumn(
            "nd", F.count(F.lit(1)).over(Window.partitionBy("g"))
        )
        .filter(F.col("nd") >= 2)
        .join(src, "doc_id")
    )
    # both per-source measures in ONE aggregation pass: distinct docs
    # with >= 1 shared span == COUNT(DISTINCT doc_id) (doc -> source is
    # unique), alongside COUNT(DISTINCT g)
    f = hit.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias(
            "n_docs_with_shared_span"
        ),
        F.countDistinct("g").cast("long").alias("n_shared_grams"),
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return base.join(f, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_docs_with_shared_span", F.lit(0)).alias(
            "n_docs_with_shared_span"
        ),
        F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
    )


# Shared fuzzy-linkage candidate machinery for q217 (pair audit) and
# q250 (transitive entity clusters): block on the last name token, verify
# with Levenshtein <= 3. ONE definition per engine — tune the blocking
# key or threshold here and both queries (and both oracles) follow.

@register(
    "q224_bpe_merges",
    build_time_exec="each BPE round's argmax pair is a 1-row collect at plan build",
    oracle="""
    WITH wf AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT UNNEST(list_filter(string_split_regex(lower(trim(text)),
                     '\\s+'), x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    r1 AS (
      SELECT w, c,
             ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS s
      FROM wf
    ),
    """
    + _bpe_round_sql(1)
    + ","
    + _bpe_round_sql(2)
    + ","
    + _bpe_round_sql(3)
    + """
    SELECT CAST(1 AS INTEGER) AS merge_rank, a AS sym_a, b AS sym_b,
           CAST(cnt AS BIGINT) AS pair_count FROM m1
    UNION ALL
    SELECT CAST(2 AS INTEGER), a, b, CAST(cnt AS BIGINT) FROM m2
    UNION ALL
    SELECT CAST(3 AS INTEGER), a, b, CAST(cnt AS BIGINT) FROM m3
    """,
)
def q224_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X151 — BPE tokenizer training, first 3 merge rounds: the
    byte-pair-encoding vocabulary-induction loop every modern tokenizer
    starts from. Each round counts adjacent symbol pairs weighted by
    word frequency, picks the most frequent pair (tiebreak: count desc,
    then pair lexicographic), and fuses it everywhere.

    Scale shape: BPE statistics live on the WORD-FREQUENCY table, not
    the corpus — the one corpus-sized shuffle is the initial word count;
    every round after that runs on the vocabulary (dimension-sized, here
    ~40 rows, in practice ~10^6 — still thousands of times smaller than
    the corpus). The per-round argmax is a 1-row collect by design
    (bounded driver work, like q55's k-means sample); the merge itself
    is 4 fixed non-overlapping ``replace`` passes over the padded
    symbol string — enough to reach the greedy-BPE fixpoint for any
    realistic word, and mirrored pass-for-pass in the oracle so both
    engines compute the identical (if pathological-repeat-inexact)
    semantics.
    """
    docs = load(spark, sf_dir, "documents")
    from noaa_ais_glue_lakehouse_spark.operators.tokenizer import bpe_merges

    wf = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bpe_merges caches wf for its per-round collects and unpersists it
    # before returning — no storage leak across the session
    return bpe_merges(spark, wf, rounds=3, replace_passes=4)



@register(
    "q238_token_pmi",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the document-count scalar attached to the PMI pair table / burstiness token table",
    oracle="""
    WITH inc AS (
      SELECT DISTINCT doc_id, UNNEST(list_filter(string_split_regex(
               lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
      FROM documents
    ),
    n_a AS (SELECT tok, COUNT(*) AS na FROM inc GROUP BY tok),
    g AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM inc),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS nab
      FROM inc a JOIN inc b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
    )
    SELECT tok_a, tok_b, CAST(nab AS BIGINT) AS n_ab,
           CAST(ROUND(1000000.0 * ln(CAST(nab * nd AS DOUBLE)
                / (ma.na * mb.na))) AS BIGINT) AS pmi_micro
    FROM pairs
    JOIN n_a ma ON ma.tok = pairs.tok_a
    JOIN n_a mb ON mb.tok = pairs.tok_b, g
    WHERE nab >= 5
    ORDER BY pmi_micro DESC, tok_a, tok_b LIMIT 50
    """,
)
def q238_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X165 — pointwise mutual information of token pairs by document
    co-occurrence (presence-based): PMI = ln(P(a,b)/(P(a)P(b))), the
    classic distributional-semantics association score (the PPMI matrix
    underlying pre-neural word vectors) and a collocation detector for
    template mining. Top-50 associated pairs with support >= 5.

    Plan shape: the pair counts come from an equi-self-join on doc_id
    over the DISTINCT (doc, token) incidence — fan-out per doc is
    C(per-doc vocab, 2), bounded by document length, never |vocab|^2;
    marginals ride a token-key aggregation and join back broadcast-
    sized. PMI is rounded to integer micros so the top-50 order is
    engine-exact.
    """
    docs = load(spark, sf_dir, "documents")
    inc = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    ).distinct()
    na = inc.groupBy("tok").agg(F.count(F.lit(1)).alias("na"))
    g = inc.agg(F.countDistinct("doc_id").alias("nd"))
    pairs = (
        inc.alias("a")
        .join(
            inc.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= 5)
    )
    ma = na.select(F.col("tok").alias("tok_a"), F.col("na").alias("na_a"))
    mb = na.select(F.col("tok").alias("tok_b"), F.col("na").alias("na_b"))
    pmi = F.round(
        F.lit(1000000.0)
        * F.log(
            (F.col("nab") * F.col("nd")).cast("double")
            / (F.col("na_a") * F.col("na_b"))
        )
    ).cast("long")
    return (
        pairs.join(F.broadcast(ma), "tok_a")
        .join(F.broadcast(mb), "tok_b")
        .crossJoin(F.broadcast(g))
        .select(
            "tok_a",
            "tok_b",
            F.col("nab").cast("long").alias("n_ab"),
            pmi.alias("pmi_micro"),
        )
        .orderBy(F.col("pmi_micro").desc(), "tok_a", "tok_b")
        .limit(50)
    )



@register(
    "q239_token_burstiness",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: the document-count scalar attached to the PMI pair table / burstiness token table",
    oracle="""
    WITH dc AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM (
        SELECT doc_id, UNNEST(list_filter(string_split_regex(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    g AS (SELECT COUNT(*) AS nd FROM documents),
    t AS (
      SELECT tok, SUM(c) AS sc, SUM(c * c) AS scc, COUNT(*) AS docs_with
      FROM dc GROUP BY tok
    )
    SELECT tok, CAST(sc AS BIGINT) AS n_total,
           CAST(docs_with AS BIGINT) AS n_docs,
           ROUND(CAST(nd * scc - sc * sc AS DOUBLE) / (nd * sc), 6)
             AS fano
    FROM t, g
    WHERE sc >= 50
    """,
)
def q239_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X166 — token burstiness via the Fano factor (variance-to-mean
    ratio of per-document counts, zeros included): content words burst
    (Fano >> 1 — when they appear, they appear repeatedly), function
    words and template filler spread evenly (Fano ~ 1, the Poisson
    line). A corpus-quality signal Zipf slope (q215) and TTR (q164)
    can't see: it distinguishes topical concentration from uniform
    keyword stuffing.

    The zero-count documents never materialize: with Z zero docs,
    var = (sum c^2 - (sum c)^2 / N) / N needs only the nonzero rollup
    plus the document count N — so fano = (N*scc - sc^2)/(N*sc) is
    exact integer arithmetic over the (doc, token) rollup. One explode
    + two stacked aggregations sharing the token key.
    """
    docs = load(spark, sf_dir, "documents")
    dc = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g = docs.agg(F.count(F.lit(1)).alias("nd"))
    t = dc.groupBy("tok").agg(
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.count(F.lit(1)).alias("docs_with"),
    )
    return (
        t.crossJoin(F.broadcast(g))
        .filter(F.col("sc") >= 50)
        .select(
            "tok",
            F.col("sc").cast("long").alias("n_total"),
            F.col("docs_with").cast("long").alias("n_docs"),
            F.round(
                (F.col("nd") * F.col("scc") - F.col("sc") * F.col("sc"))
                .cast("double")
                / (F.col("nd") * F.col("sc")),
                6,
            ).alias("fano"),
        )
    )



@register(
    "q240_heaps_law",
    oracle="""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab
      FROM (
        SELECT source, UNNEST(list_filter(string_split_regex(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY source
    ),
    pts AS (
      SELECT ln(CAST(n_tokens AS DOUBLE)) AS x,
             ln(CAST(vocab AS DOUBLE)) AS y
      FROM per_src
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6) AS heaps_beta,
           ROUND((SUM(y) - (COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                           / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x))
                           * SUM(x)) / COUNT(*), 6) AS log_k
    FROM pts
    """,
)
def q240_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X167 — Heaps'-law fit: vocabulary growth V = K * n^beta across
    corpus slices, estimated by log-log OLS over the per-source
    (token count, vocab size) points. Natural text sits near beta ~
    0.4-0.6; beta near 0 means a closed template vocabulary, near 1
    means id-like token churn. The companion corpus-law screen to
    Zipf's slope (q215) — together they characterize the frequency
    distribution AND its growth.

    Plan shape: one explode + per-source count/distinct aggregation
    (the only corpus-sized work), then the regression is the exact
    closed-form moment ratio over |sources| points.
    """
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("vocab"),
        )
    )
    pts = per_src.select(
        F.log(F.col("n_tokens").cast("double")).alias("x"),
        F.log(F.col("vocab").cast("double")).alias("y"),
    )
    cnt = F.count(F.lit(1))
    slope = (cnt * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        cnt * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    return pts.agg(
        cnt.cast("long").alias("n_points"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round((F.sum("y") - slope * F.sum("x")) / cnt, 6).alias("log_k"),
    )



@register(
    "q246_doremi_reweight",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross joins: corpus token total / mean-CE / weight-total scalars on the |sources|-sized tables",
    oracle="""
    WITH tc AS (
      SELECT source, tok, COUNT(*) AS n FROM (
        SELECT source, UNNEST(list_filter(string_split_regex(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    st AS (SELECT source, SUM(n) AS ns FROM tc GROUP BY source),
    ct AS (SELECT tok, SUM(n) AS nt FROM tc GROUP BY tok),
    g AS (SELECT SUM(n) AS nn FROM tc),
    ce AS (
      SELECT tc.source,
             SUM(CAST(ROUND(1000000.0 * tc.n
                  * (-ln(CAST(nt AS DOUBLE) / nn)) / ns) AS BIGINT))
               AS ce_micro
      FROM tc JOIN st USING (source) JOIN ct USING (tok), g
      GROUP BY tc.source
    ),
    m AS (
      SELECT CAST(SUM(ce_micro) AS DOUBLE) / COUNT(*) AS mean_ce_micro,
             COUNT(*) AS n_src
      FROM ce
    ),
    raw AS (
      SELECT ce.source, ce.ce_micro,
             CAST(ROUND(1000000000.0 * (CAST(ns AS DOUBLE) / nn)
                  * exp((ce_micro - mean_ce_micro) / 1000000.0))
               AS BIGINT) AS raw_nano
      FROM ce JOIN st USING (source), g, m
    ),
    tot AS (SELECT SUM(raw_nano) AS traw FROM raw)
    SELECT source,
           ROUND(ce_micro / 1000000.0, 6) AS cross_entropy,
           ROUND(CAST(raw_nano AS DOUBLE) / traw, 6) AS new_weight
    FROM raw, tot
    """,
)
def q246_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X174 — DoReMi-flavored mixture reweighting: each source's new
    sampling weight is its token share scaled by exp(excess loss),
    where loss is the source's cross-entropy against the CORPUS unigram
    distribution — sources that diverge from the mixture get upweighted
    (eta = 1), the one-step form of the DoReMi group-DRO update. The
    companion to q184's temperature reweighting: that one only sees
    sizes, this one sees distributions.

    Determinism: every float SUM is pre-rounded to integer micros/nanos
    per term (CE terms, raw weights) so accumulation order can never
    change the output; ln/exp appear only inside mirrored per-row
    expressions. Plan shape: one (source, token) rollup feeds source
    totals, corpus totals and the CE join — all token-key equi-joins;
    scalars ride 1-row broadcasts.
    """
    docs = load(spark, sf_dir, "documents")
    tc = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    st = tc.groupBy("source").agg(F.sum("n").alias("ns"))
    ct = tc.groupBy("tok").agg(F.sum("n").alias("nt"))
    g = tc.agg(F.sum("n").alias("nn"))
    term = F.round(
        F.lit(1000000.0)
        * F.col("n")
        * (-F.log(F.col("nt").cast("double") / F.col("nn")))
        / F.col("ns")
    ).cast("long")
    ce = (
        tc.join(F.broadcast(st), "source")
        .join(F.broadcast(ct), "tok")
        .crossJoin(F.broadcast(g))
        .groupBy("source")
        .agg(F.sum(term).alias("ce_micro"))
    )
    m = ce.agg(
        (F.sum("ce_micro").cast("double") / F.count(F.lit(1))).alias(
            "mean_ce_micro"
        )
    )
    raw = (
        ce.join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(m))
        .select(
            "source",
            "ce_micro",
            F.round(
                F.lit(1000000000.0)
                * (F.col("ns").cast("double") / F.col("nn"))
                * F.exp(
                    (F.col("ce_micro") - F.col("mean_ce_micro"))
                    / F.lit(1000000.0)
                )
            )
            .cast("long")
            .alias("raw_nano"),
        )
    )
    tot = raw.agg(F.sum("raw_nano").alias("traw"))
    return raw.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(F.col("ce_micro") / 1000000.0, 6).alias("cross_entropy"),
        F.round(F.col("raw_nano").cast("double") / F.col("traw"), 6).alias(
            "new_weight"
        ),
    )



@register(
    "q251_sequence_packing",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id) AS c
      FROM d
    ),
    binned AS (
      SELECT doc_id, n_tokens, (c - n_tokens) // 512 AS bin FROM cum
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / 512.0, 6) AS fill_rate
    FROM binned GROUP BY bin
    """,
)
def q251_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X179 — training sequence packing: pack documents (in stable
    doc_id order) into 512-token context windows by next-fit on the
    exclusive prefix sum — the step that turns a cleaned corpus into
    dense training batches, with fill_rate the packing-efficiency
    number the training team actually asks for. The same prefix-scan
    bucket algebra as the compaction planner (q245), applied to tokens
    instead of bytes — one mechanism, two maintenance surfaces.

    Plan shape: one projection for token counts, one two-phase parallel
    prefix scan (never a single-task window at scale — mirrored here by
    the oracle's window over the same total order), one bin rollup.
    """
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens")
    )
    run = global_running_sum(d, ["doc_id"], "n_tokens", out_col="c")
    binned = run.select(
        "n_tokens",
        F.expr("(c - n_tokens) div 512").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.sum("n_tokens").cast("double") / F.lit(512.0), 6).alias(
            "fill_rate"
        ),
    )



@register(
    "q252_budgeted_selection",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, ts AS toks FROM (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS ts
        FROM documents
      )
    ),
    scored AS (
      SELECT doc_id, source, len(toks) AS n_tokens,
             CAST(ROUND(1000000.0 * len(list_distinct(toks)) / len(toks))
               AS BIGINT) AS quality_micro
      FROM d WHERE len(toks) > 0
    ),
    cum AS (
      SELECT doc_id, source, n_tokens, quality_micro,
             SUM(n_tokens) OVER (ORDER BY quality_micro DESC, doc_id) AS c
      FROM scored
    ),
    sel AS (SELECT * FROM cum WHERE c <= 10000)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
           ROUND(CAST(SUM(quality_micro) AS DOUBLE) / COUNT(*) / 1000000.0,
                 6) AS mean_quality
    FROM sel GROUP BY source
    """,
)
def q252_budgeted_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X180 — data selection under a token budget: rank documents by a
    quality score (here lexical diversity = distinct/total tokens, in
    integer micros) and greedily take the best until a 10k-token budget
    is exhausted (the rows whose running token total stays inside the
    budget). The curation step between quality scoring (q30/q106) and
    training-set assembly (q116): "given 10k tokens of budget, which
    docs make the cut and what does each source contribute?"

    Plan shape: per-doc scores are a pure projection; the greedy
    cutoff is the two-phase prefix scan over the (quality desc, doc_id)
    total order; reporting is a per-source rollup of the selected set.
    """
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.lit(1000000.0)
            * F.size(F.array_distinct(toks))
            / F.size(toks)
        )
        .cast("long")
        .alias("quality_micro"),
    ).filter(F.col("n_tokens") > 0)
    run = global_running_sum(
        scored.withColumn("neg_q", -F.col("quality_micro")),
        ["neg_q", "doc_id"],
        "n_tokens",
        out_col="c",
    )
    sel = run.filter(F.col("c") <= 10000)
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.sum("n_tokens").cast("long").alias("tokens_selected"),
        F.round(
            F.sum("quality_micro").cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0),
            6,
        ).alias("mean_quality"),
    )



@register(
    "q260_bpe_encode",
    build_time_exec="BPE encode learns its merges at plan build (same argmax collects)",
    oracle="""
    WITH wf AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT UNNEST(list_filter(string_split_regex(lower(trim(text)),
                     '\\s+'), x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    r1 AS (
      SELECT w, c,
             ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS s
      FROM wf
    ),
    """
    + _bpe_round_sql(1)
    + ","
    + _bpe_round_sql(2)
    + ","
    + _bpe_round_sql(3)
    + """,
    enc AS (
      SELECT w,
             len(list_filter(string_split(trim(s), ' '), x -> x <> ''))
               AS n_sym
      FROM r4
    ),
    dt AS (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x <> '')) AS w
      FROM documents
    )
    SELECT dt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.n_sym) AS BIGINT) AS n_symbols
    FROM dt JOIN enc e USING (w)
    GROUP BY dt.doc_id
    """,
)
def q260_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X189 — BPE ENCODING, the apply half of q224's training: learn 3
    merges from the corpus word frequencies, apply them to the
    vocabulary (same fixed 4-pass non-overlapping replace chain as
    training, mirrored in the oracle), then report per-document word and
    post-merge symbol counts — the token-budget number a trained
    tokenizer actually produces.

    Scale shape: merges apply to the VOCABULARY (dimension-sized), never
    to the corpus text — encoding is a word equi-join against the
    encoded vocab, so per-token cost at 100 TB is a hash lookup. The
    merge learning is the same bounded 1-row-per-round driver argmax as
    q224 (plan-build execution, see BUILD_TIME_EXECUTION).
    """
    from noaa_ais_glue_lakehouse_spark.operators.tokenizer import (
        bpe_apply,
        bpe_learn,
    )

    docs = load(spark, sf_dir, "documents")
    dt = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("w"))
    wf = dt.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    merges = bpe_learn(spark, wf, rounds=3, replace_passes=4)
    enc = bpe_apply(wf.select("w"), merges).select(
        "w",
        F.size(
            F.filter(
                F.split(F.trim(F.col("s")), " "), lambda x: x != F.lit("")
            )
        ).alias("n_sym"),
    )
    return (
        dt.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_symbols"),
        )
    )



@register(
    "q269_gopher_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, toks,
             len(array_to_string(toks, ' ')) AS doc_len
      FROM t WHERE len(toks) >= 5
    ), g2 AS (
      SELECT doc_id, doc_len, UNNEST(
        list_transform(range(1, len(toks)),
                       i -> array_to_string(toks[i:i+1], ' '))) AS gram
      FROM f
    ), c2 AS (
      SELECT doc_id, doc_len, gram, COUNT(*) AS cnt
      FROM g2 GROUP BY doc_id, doc_len, gram
    ), top2 AS (
      SELECT doc_id, doc_len, gram, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, gram) AS rn
      FROM c2
    ), g5 AS (
      SELECT doc_id, UNNEST(
        list_transform(range(1, len(toks) - 3),
                       i -> array_to_string(toks[i:i+4], ' '))) AS gram
      FROM f
    ), c5 AS (
      SELECT doc_id, gram, COUNT(*) AS cnt
      FROM g5 GROUP BY doc_id, gram
    ), d5 AS (
      SELECT doc_id,
             SUM(CASE WHEN cnt >= 2 THEN cnt * len(gram) ELSE 0 END) AS dupchars
      FROM c5 GROUP BY doc_id
    )
    SELECT top2.doc_id AS doc_id,
           top2.gram AS top2_gram,
           ROUND(CAST(top2.cnt * len(top2.gram) AS DOUBLE) / top2.doc_len, 6)
             AS top2_char_frac,
           ROUND(CAST(COALESCE(d5.dupchars, 0) AS DOUBLE) / top2.doc_len, 6)
             AS dup5_char_frac
    FROM top2 LEFT JOIN d5 ON top2.doc_id = d5.doc_id
    WHERE top2.rn = 1
    """,
)
def q269_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-filter signals (Rae et al. 2021 §A1.1): the
    character fraction of the single most frequent word 2-gram, and the
    character fraction covered by duplicated 5-grams (all occurrences of
    grams appearing ≥2×; Gopher's once-per-character variant needs
    positional interval union — this is the standard counting proxy).

    Shape: one token projection feeds both gram sizes; each explodes and
    hash-aggregates on (doc_id, gram) — the same shuffle key, so AQE
    reuses the exchange layout; the per-doc argmax is a combinable
    MIN(struct(-cnt, gram)) (most frequent, lexicographically first on
    ties), never a per-doc sort. Docs with <5 tokens are excluded so
    both signals are defined.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    base = docs.select(
        "doc_id",
        toks.alias("_toks"),
        F.length(F.array_join(toks, " ")).alias("doc_len"),
    ).filter(F.size("_toks") >= 5)
    g2 = base.select(
        "doc_id", "doc_len", F.explode(_word_ngrams(F.col("_toks"), 2)).alias("gram")
    )
    c2 = g2.groupBy("doc_id", "doc_len", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    top2 = (
        c2.groupBy("doc_id", "doc_len")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("_neg"), F.col("gram").alias("gram"))
            ).alias("_m")
        )
        .select(
            "doc_id",
            "doc_len",
            F.col("_m.gram").alias("top2_gram"),
            (-F.col("_m._neg")).alias("top2_cnt"),
        )
    )
    g5 = base.select(
        "doc_id", F.explode(_word_ngrams(F.col("_toks"), 5)).alias("gram")
    )
    c5 = g5.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    d5 = c5.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(0)
        ).alias("dupchars")
    )
    return (
        top2.join(d5, "doc_id", "left")
        .select(
            "doc_id",
            "top2_gram",
            F.round(
                (F.col("top2_cnt") * F.length("top2_gram")).cast("double")
                / F.col("doc_len"),
                6,
            ).alias("top2_char_frac"),
            F.round(
                F.coalesce(F.col("dupchars"), F.lit(0)).cast("double")
                / F.col("doc_len"),
                6,
            ).alias("dup5_char_frac"),
        )
    )



@register(
    "q271_fim_transform",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, toks, len(toks) AS n,
             1 + (doc_id % 2147483648) * 2654435761 % 4294967296
                   % (len(toks) - 2) AS a
      FROM t WHERE len(toks) >= 5
    ), s AS (
      SELECT doc_id, toks, n, a,
             a + 1 + ((doc_id + 7) % 2147483648) * 2654435761 % 4294967296
                       % (n - a - 1) AS b
      FROM f
    )
    SELECT doc_id, CAST(a AS BIGINT) AS cut_a, CAST(b AS BIGINT) AS cut_b,
           array_to_string(toks[1:a], ' ') AS prefix,
           array_to_string(toks[a+1:b], ' ') AS middle,
           array_to_string(toks[b+1:n], ' ') AS suffix,
           '<PRE>' || array_to_string(toks[1:a], ' ')
             || '<SUF>' || array_to_string(toks[b+1:n], ' ')
             || '<MID>' || array_to_string(toks[a+1:b], ' ') AS fim_text
    FROM s
    """,
)
def q271_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    PSM→SPM reorder): split each document's tokens at two deterministic
    cut points into prefix/middle/suffix, and emit the FIM-reordered
    training text ``<PRE>prefix<SUF>suffix<MID>middle``.

    Cut points come from the same Knuth multiplicative hash both engines
    compute exactly (no RNG): a ∈ [1, n-2], b ∈ [a+1, n-1], so all three
    segments are non-empty. Entirely row-local column expressions —
    tokenize, two hash mods, three slices, concat — zero shuffles, zero
    UDFs; Catalyst keeps the whole projection in one codegen stage.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    base = docs.select("doc_id", toks.alias("_toks")).filter(
        F.size("_toks") >= 5
    )
    n = F.size("_toks")
    knuth = lambda c: (c % F.lit(2147483648)) * F.lit(2654435761) % F.lit(4294967296)
    a = (F.lit(1) + knuth(F.col("doc_id")) % (n - 2)).alias("a")
    base = base.select("doc_id", "_toks", n.alias("n"), a)
    b = (
        F.col("a") + 1 + knuth(F.col("doc_id") + 7) % (F.col("n") - F.col("a") - 1)
    ).alias("b")
    base = base.select("doc_id", "_toks", "n", "a", b)
    prefix = F.array_join(F.slice("_toks", F.lit(1), F.col("a")), " ")
    middle = F.array_join(
        F.slice("_toks", F.col("a") + 1, F.col("b") - F.col("a")), " "
    )
    suffix = F.array_join(
        F.slice("_toks", F.col("b") + 1, F.col("n") - F.col("b")), " "
    )
    return base.select(
        "doc_id",
        F.col("a").cast("long").alias("cut_a"),
        F.col("b").cast("long").alias("cut_b"),
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        F.concat(
            F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle
        ).alias("fim_text"),
    )



@register(
    "q273_quality_classifier",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> '')) AS toks
      FROM documents
    ), e AS (
      SELECT doc_id, UNNEST(toks) AS tok FROM t WHERE len(toks) > 0
    ), w AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 2001 - 1000
               AS w_milli
      FROM e
    ), s AS (
      SELECT doc_id,
             CAST(SUM(w_milli) AS BIGINT) AS z_milli,
             CAST(COUNT(*) AS BIGINT) AS n_features
      FROM w GROUP BY doc_id
    )
    SELECT doc_id, n_features, z_milli,
           ROUND(1.0 / (1.0 + exp(-(CAST(z_milli AS DOUBLE) / 1000.0
                                    / n_features))), 6) AS quality_score,
           z_milli > 0 AS keep
    FROM s
    """,
)
def q273_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear quality classifier inference (the fastText /
    DSIR-style fasttext-filter shape): each distinct token is a presence
    feature whose weight comes from a hash-indexed weight vector — here a
    deterministic md5-derived integer-milli weight so both engines score
    identically; a trained model swaps in the same-shape broadcast weight
    table without changing the plan. Score = sigmoid of the mean feature
    weight; the keep decision is made on the EXACT integer logit sum, so
    classification never hinges on float rounding.

    Shape: distinct-token explode → row-local weight expression (no
    weight-table join needed under the hashing trick) → one (doc_id)
    hash aggregation. The sigmoid is display-only.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.array_distinct(tokenize(F.col("text")))
    e = docs.select("doc_id", toks.alias("_toks")).filter(
        F.size("_toks") > 0
    ).select("doc_id", F.explode("_toks").alias("tok"))
    w_milli = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % 2001
        - 1000
    )
    s = e.select("doc_id", w_milli.alias("w_milli")).groupBy("doc_id").agg(
        F.sum("w_milli").cast("long").alias("z_milli"),
        F.count(F.lit(1)).cast("long").alias("n_features"),
    )
    return s.select(
        "doc_id",
        "n_features",
        "z_milli",
        F.round(
            1.0
            / (
                1.0
                + F.exp(
                    -(
                        F.col("z_milli").cast("double")
                        / 1000.0
                        / F.col("n_features")
                    )
                )
            ),
            6,
        ).alias("quality_score"),
        (F.col("z_milli") > 0).alias("keep"),
    )



@register(
    "q274_dsir_selection",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the (totals, vocab) LM-smoothing scalar attached to the |vocab|-sized table before it joins the token stream",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), v AS (
      SELECT tok,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS nt,
             COUNT(*) AS nc
      FROM t GROUP BY tok
    ), tot AS (
      SELECT SUM(nt) AS tt, SUM(nc) AS tc,
             CAST(COUNT(*) AS DOUBLE) AS vocab
      FROM v
    ), scored AS (
      SELECT t.doc_id,
             SUM(ln((v.nt + 1.0) / (tot.tt + tot.vocab))
                 - ln((v.nc + 1.0) / (tot.tc + tot.vocab))) AS lw
      FROM t JOIN v ON v.tok = t.tok, tot
      GROUP BY t.doc_id
    )
    SELECT doc_id, ROUND(lw, 6) AS log_importance
    FROM scored
    ORDER BY ROUND(lw, 6) DESC, doc_id
    LIMIT 50
    """,
)
def q274_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023): rank documents
    by the log-likelihood ratio of a target-domain unigram LM (docs from
    'src0', add-one smoothed) over the whole-corpus LM, and keep the
    top 50 — the "select pretraining data that looks like the target"
    primitive.

    Both LMs come from ONE (token) rollup with a conditional target
    count — no second pass; the (total, vocab) scalars attach to the
    |vocab|-sized table by a deliberate 1-row broadcast cross join
    BEFORE it joins the token stream, so the stream-side join stays a
    pure token equi-join (broadcast: vocab ≪ corpus). Ranking uses the
    6-dp-rounded weight with a doc_id tiebreak so float ulps can't
    reorder the cut; top-50 is TakeOrdered, never a global sort.
    """
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    v = t.groupBy("tok").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("nt"),
        F.count(F.lit(1)).alias("nc"),
    )
    tot = v.agg(
        F.sum("nt").alias("tt"),
        F.sum("nc").alias("tc"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    vw = v.crossJoin(F.broadcast(tot)).select(
        "tok",
        (
            F.log((F.col("nt") + 1.0) / (F.col("tt") + F.col("vocab")))
            - F.log((F.col("nc") + 1.0) / (F.col("tc") + F.col("vocab")))
        ).alias("term"),
    )
    scored = (
        t.join(F.broadcast(vw), "tok")
        .groupBy("doc_id")
        .agg(F.round(F.sum("term"), 6).alias("log_importance"))
    )
    return scored.orderBy(
        F.col("log_importance").desc(), F.col("doc_id")
    ).limit(50)



@register(
    "q275_preference_pairs",
    oracle="""
    WITH s AS (
      SELECT doc_id, source, lang,
             len(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> ''))) AS score
      FROM documents
    )
    SELECT source, lang,
           (MIN({'n': -score, 'id': doc_id})).id AS chosen_id,
           CAST(MAX(score) AS BIGINT) AS chosen_score,
           -(MIN({'p': score, 'nid': -doc_id})).nid AS rejected_id,
           CAST(MIN(score) AS BIGINT) AS rejected_score,
           CAST(MAX(score) - MIN(score) AS BIGINT) AS margin
    FROM s
    GROUP BY source, lang
    HAVING COUNT(*) >= 2 AND MAX(score) > MIN(score)
    """,
)
def q275_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for reward-model training: within
    each (source, lang) bucket, pair the highest-scoring document
    (chosen) with the lowest-scoring one (rejected) under a lexical
    quality score (distinct-token count), keeping only buckets with a
    real margin. The RLHF data-prep shape: per-group argmax AND argmin
    in one combinable aggregation — MIN over (±score, ±id) structs, no
    window, no per-group sort, one shuffle on the bucket key.

    Tiebreaks are pinned both ways (lowest doc_id among chosen ties,
    HIGHEST doc_id among rejected ties) so the pair is unique even in
    all-equal buckets — which the margin filter then drops.
    """
    docs = load(spark, sf_dir, "documents")
    score = F.size(F.array_distinct(tokenize(F.col("text"))))
    s = docs.select("doc_id", "source", "lang", score.alias("score"))
    agg = s.groupBy("source", "lang").agg(
        F.min(
            F.struct((-F.col("score")).alias("_n"), F.col("doc_id").alias("id"))
        ).alias("_ch"),
        F.min(
            F.struct(F.col("score").alias("_p"), (-F.col("doc_id")).alias("_nid"))
        ).alias("_rj"),
        F.count(F.lit(1)).alias("_n_docs"),
    )
    return (
        agg.filter(
            (F.col("_n_docs") >= 2) & (-F.col("_ch._n") > F.col("_rj._p"))
        )
        .select(
            "source",
            "lang",
            F.col("_ch.id").alias("chosen_id"),
            (-F.col("_ch._n")).cast("long").alias("chosen_score"),
            (-F.col("_rj._nid")).alias("rejected_id"),
            F.col("_rj._p").cast("long").alias("rejected_score"),
            (-F.col("_ch._n") - F.col("_rj._p")).cast("long").alias("margin"),
        )
    )



@register(
    "q291_flesch_readability",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
               AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
               AS n_syllables,
             GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                      1) AS n_sentences
      FROM documents
    )
    SELECT doc_id, n_words, n_syllables, n_sentences,
           ROUND(206.835
                 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
                 - 84.6 * CAST(n_syllables AS DOUBLE) / n_words, 4)
             AS flesch
    FROM m WHERE n_words > 0
    """,
)
def q291_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with the classic no-dictionary
    syllable heuristic (a syllable ≈ one contiguous vowel-group
    [aeiouy]+; sentences ≈ terminal-punctuation runs, floored at 1).
    The difficulty signal readability-based curation filters (child-
    safe corpora, ELI5-style selection) run at corpus scale: three
    regexp counts per row — pure codegen projection, no shuffle at
    all."""
    docs = load(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n_words = F.size(F.regexp_extract_all(lower, F.lit("[a-z]+"), F.lit(0))).cast("long")
    n_syll = F.size(F.regexp_extract_all(lower, F.lit("[aeiouy]+"), F.lit(0))).cast("long")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))).cast("long"),
        F.lit(1),
    )
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        n_sent.alias("n_sentences"),
    ).filter(F.col("n_words") > 0)
    return m.select(
        "doc_id",
        "n_words",
        "n_syllables",
        "n_sentences",
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * F.col("n_words").cast("double") / F.col("n_sentences")
            - F.lit(84.6) * F.col("n_syllables").cast("double") / F.col("n_words"),
            4,
        ).alias("flesch"),
    )



@register(
    "q292_tokenizer_fertility",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                  x -> x <> '')) AS BIGINT) AS n_words,
             n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words), 6) AS fertility,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe), 6)
             AS chars_per_token
    FROM t WHERE n_words > 0 GROUP BY lang
    """,
)
def q292_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — subword tokens per whitespace
    word and characters per token, THE per-language cost model for a
    multilingual token budget (a high-fertility language pays more
    context window per word; the metric that drives per-language
    sampling corrections in multilingual pretraining). Integer token
    counts are summed exactly per language; the two ratios divide once
    at the end. Pure projection + one small aggregation."""
    from noaa_ais_glue_lakehouse_spark.functions.text import bpe_ish_tokens

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    t = docs.select(
        "lang",
        F.size(bpe_ish_tokens(F.col("text"))).cast("long").alias("n_bpe"),
        F.size(toks).cast("long").alias("n_words"),
        "n_chars",
    ).filter(F.col("n_words") > 0)
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bpe").cast("long").alias("total_bpe"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.round(
            F.sum("n_bpe").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_bpe"), 6
        ).alias("chars_per_token"),
    )



@register(
    "q293_curriculum_stages",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: the corpus-count scalar attached to the prefix-scan rank column for the NTILE(4) formula",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_words,
             n_chars
      FROM documents
    ), scored AS (
      SELECT doc_id, source, n_words,
             CAST(ROUND(1000000.0 * n_chars / n_words) AS BIGINT)
               AS difficulty_micro
      FROM d WHERE n_words > 0
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY difficulty_micro, doc_id) AS rk,
             COUNT(*) OVER () AS n_total
      FROM scored
    )
    SELECT CAST(FLOOR((rk - 1) * 4.0 / n_total) AS INT) + 1 AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(MIN(difficulty_micro) AS BIGINT) AS min_difficulty_micro,
           CAST(MAX(difficulty_micro) AS BIGINT) AS max_difficulty_micro
    FROM ranked GROUP BY 1
    """,
)
def q293_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: documents ordered easy→hard by mean word
    length (integer micros) and cut into 4 equal-count training stages —
    the data-side half of curriculum learning (feed stage 1 first, then
    widen). The global position comes from the two-phase parallel prefix
    scan (global_running_sum of 1 — never a single-task window over the
    corpus), and the corpus count rides a deliberate 1-row broadcast
    cross join; the stage formula floor((rank-1)·4/N)+1 reproduces
    NTILE(4) exactly for every N."""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        "n_chars",
    ).filter(F.col("n_words") > 0)
    scored = scored.withColumn(
        "difficulty_micro",
        F.round(F.lit(1_000_000.0) * F.col("n_chars") / F.col("n_words")).cast(
            "long"
        ),
    )
    ranked = global_running_sum(
        scored.withColumn("_one", F.lit(1)),
        ["difficulty_micro", "doc_id"],
        "_one",
        out_col="rk",
    )
    # count the PRE-scan relation (row-count-preserving scan; counting
    # `ranked` would re-run the repartitionByRange + window pipeline)
    total = scored.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    staged = ranked.crossJoin(F.broadcast(total)).withColumn(
        "stage",
        (
            F.floor((F.col("rk") - 1) * 4.0 / F.col("n_total")).cast("int") + 1
        ),
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.min("difficulty_micro").cast("long").alias("min_difficulty_micro"),
        F.max("difficulty_micro").cast("long").alias("max_difficulty_micro"),
    )



@register(
    "q300_grpo_advantages",
    oracle="""
    WITH g AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS r_cents,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS s1,
             SUM(CAST(ROUND(value * 100) AS BIGINT)
                 * CAST(ROUND(value * 100) AS BIGINT)) OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE))
    )
    SELECT event_id,
           ROUND(CASE WHEN n >= 2 AND n*s2 > s1*s1 THEN
             (n*r_cents - s1)
             / SQRT(CAST(n AS DOUBLE)) / SQRT(CAST(n*s2 - s1*s1 AS DOUBLE))
           ELSE 0.0 END, 6) AS advantage
    FROM g
    """,
)
def q300_grpo_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage normalization (the GRPO/RLOO data-prep
    step: per prompt-group, advantage = (r − mean)/std over the group's
    sampled completions — here user-day groups standing in for
    prompt-groups, value for reward). Computed from exact integer-cent
    moment sums via one partitioned window — the algebra
    (n·r − S₁)/(√n·√(n·S₂ − S₁²)) divides integer determinants once, so
    no running float accumulates and the result is order-independent.
    Degenerate groups (n<2 or zero variance) emit 0, matching the
    RL-trainer convention of skipping constant-reward groups."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts"))
    r = cents(F.col("value"))
    g = ev.select(
        "event_id",
        r.alias("r_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum(r).over(w).alias("s1"),
        F.sum(r * r).over(w).alias("s2"),
    )
    var_det = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    adv = (
        (F.col("n") * F.col("r_cents") - F.col("s1"))
        / F.sqrt(F.col("n").cast("double"))
        / F.sqrt(var_det.cast("double"))
    )
    return g.select(
        "event_id",
        F.round(
            F.when((F.col("n") >= 2) & (var_det > 0), adv).otherwise(0.0), 6
        ).alias("advantage"),
    )



@register(
    "q301_padding_waste_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), b AS (
      SELECT n_tokens,
             CAST(POWER(2, CEIL(LOG2(GREATEST(n_tokens, 1)))) AS BIGINT)
               AS bucket
      FROM d WHERE n_tokens > 0
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS real_tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           ROUND(1.0 - CAST(SUM(n_tokens) AS DOUBLE) / (COUNT(*) * bucket), 6)
             AS waste_frac
    FROM b GROUP BY bucket
    """,
)
def q301_padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for length-bucketed batching: sequences are
    rounded up to power-of-2 length buckets (the kernel-friendly
    static-shape scheme) and each bucket reports the fraction of
    compute that pads instead of trains — the number you compare against
    q251's packed layout to justify sequence packing. Pure projection +
    one aggregation; the bucket is integer bit math, no UDF."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    d = docs.select(F.size(toks).cast("long").alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    bucket = F.pow(
        F.lit(2.0), F.ceil(F.log2(F.greatest(F.col("n_tokens"), F.lit(1))))
    ).cast("long")
    b = d.select("n_tokens", bucket.alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("real_tokens"),
        (F.count(F.lit(1)) * F.col("bucket")).cast("long").alias("padded_tokens"),
        F.round(
            F.lit(1.0)
            - F.sum("n_tokens").cast("double")
            / (F.count(F.lit(1)) * F.col("bucket")),
            6,
        ).alias("waste_frac"),
    )



@register(
    "q302_doc_entropy_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2, 3
    ), dn AS (
      SELECT doc_id, SUM(c) AS dn_total FROM tf GROUP BY doc_id
    ), terms AS (
      SELECT tf.doc_id, tf.source, tf.c, dn.dn_total,
             CAST(ROUND(-1000000.0 * tf.c
                  * LN(CAST(tf.c AS DOUBLE) / dn.dn_total)
                  / LN(2.0)) AS BIGINT) AS t_micro
      FROM tf JOIN dn USING (doc_id)
    ), tot AS (
      SELECT doc_id, source, MAX(dn_total) AS n, SUM(t_micro) AS w_micro
      FROM terms GROUP BY doc_id, source
    ), ent AS (
      SELECT doc_id, source,
             CAST(ROUND(CAST(w_micro AS DOUBLE) / n) AS BIGINT)
               AS entropy_micro
      FROM tot
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN entropy_micro < 3000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_entropy,
           CAST(MIN(entropy_micro) AS BIGINT) AS min_entropy_micro,
           CAST(MAX(entropy_micro) AS BIGINT) AS max_entropy_micro
    FROM ent GROUP BY source
    """,
)
def q302_doc_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document token-entropy filter (low-entropy docs are
    boilerplate/keyword-stuffing/degenerate repetition — the classic
    cheap quality gate next to Gopher rules q106): per doc, Shannon
    entropy of its own token distribution in bits, micro-rounded per
    TERM before the sum so the float total is order-independent, then
    per-source counts under the 3-bit threshold. One explode + two hash
    aggregations, all keyed on doc_id — embarrassingly parallel."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(tokenize(F.col("text"))).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wdoc = Window.partitionBy("doc_id")
    n_doc = F.sum("c").over(wdoc)
    term_micro = F.round(
        F.lit(-1_000_000.0)
        * F.col("c")
        * F.log(F.col("c").cast("double") / n_doc)
        / F.log(F.lit(2.0))
    ).cast("long")
    tot = tf.select(
        "doc_id", "source", F.col("c"), term_micro.alias("t_micro")
    ).groupBy("doc_id", "source").agg(
        F.sum("c").alias("n"), F.sum("t_micro").alias("w_micro")
    )
    ent = tot.select(
        "source",
        F.round(F.col("w_micro").cast("double") / F.col("n"))
        .cast("long")
        .alias("entropy_micro"),
    )
    return ent.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("entropy_micro") < 3_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_low_entropy"),
        F.min("entropy_micro").cast("long").alias("min_entropy_micro"),
        F.max("entropy_micro").cast("long").alias("max_entropy_micro"),
    )



@register(
    "q305_data_constrained_epochs",
    oracle="""
    WITH s AS (
      SELECT source,
             SUM(CAST(len(list_filter(string_split_regex(lower(trim(text)),
                 '\\s+'), x -> x <> '')) AS BIGINT)) AS unique_tokens
      FROM documents GROUP BY source
    )
    SELECT source, CAST(unique_tokens AS BIGINT) AS unique_tokens,
           ROUND(50000.0 / unique_tokens, 6) AS epochs,
           CAST(ROUND(1000000.0 *
                (1 - EXP(-(50000.0 / unique_tokens) / 2.5)) * 2.5
                * unique_tokens / 50000.0) AS BIGINT)
             AS effective_frac_micro
    FROM s
    """,
)
def q305_data_constrained_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained scaling plan (the Muennighoff et al. 2023 shape,
    public paper): per source, how many EPOCHS a 50k-token training
    budget implies over its unique tokens, and the effective-data
    fraction under exponentially-decaying repeated-token value
    (R* ≈ 2.5 half-value epochs): effective/budget =
    (1 − e^(−epochs/R*))·R*/epochs. The report that says "source X is
    about to be repeated 14× — its marginal tokens are worth 11% of
    fresh ones; go find more data". One token-count aggregation; the
    decay algebra is a closed-form projection over |sources| rows."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    s = docs.groupBy("source").agg(
        F.sum(F.size(toks)).cast("long").alias("unique_tokens")
    )
    epochs = F.lit(50000.0) / F.col("unique_tokens")
    eff = (
        (F.lit(1.0) - F.exp(-epochs / F.lit(2.5)))
        * F.lit(2.5)
        * F.col("unique_tokens")
        / F.lit(50000.0)
    )
    return s.select(
        "source",
        "unique_tokens",
        F.round(epochs, 6).alias("epochs"),
        F.round(F.lit(1_000_000.0) * eff).cast("long").alias(
            "effective_frac_micro"
        ),
    )



@register(
    "q307_vocab_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
        FROM toks GROUP BY tok
      ) WHERE rk <= 32
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY source
    """,
)
def q307_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against a frequency-built
    vocabulary (top-32 corpus tokens standing in for a fixed tokenizer
    vocab): the coverage check run before committing a tokenizer to a
    corpus — a source with high OOV will fragment into bytes/UNKs and
    train badly. The vocab is a TakeOrdered top-k (deterministic
    tiebreak) that BROADCASTS into the token stream; counting is one
    aggregation. At a 100k-entry real vocab the same broadcast join
    holds (megabytes)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(32)
        .select("tok")
        .withColumn("in_vocab", F.lit(1))
    )
    j = toks.join(F.broadcast(vocab), "tok", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )



@register(
    "q308_truncation_loss_audit",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(list_filter(string_split_regex(lower(trim(text)),
                  '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_tokens > 128 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           CAST(SUM(GREATEST(n_tokens - 128, 0)) AS BIGINT) AS tokens_lost,
           ROUND(CAST(SUM(GREATEST(n_tokens - 128, 0)) AS DOUBLE)
                 / SUM(n_tokens), 6) AS loss_frac
    FROM d GROUP BY source
    """,
)
def q308_truncation_loss_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-loss audit at max_seq_len=128: per source, how many
    documents overflow the context window and what fraction of their
    tokens a hard truncation throws away — the number that decides
    between truncate / chunk (q261) / pack (q251) for each source.
    Pure projection + one aggregation."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    d = docs.select(
        "source", F.size(toks).cast("long").alias("n_tokens")
    )
    lost = F.greatest(F.col("n_tokens") - 128, F.lit(0))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_tokens") > 128, 1).otherwise(0))
        .cast("long")
        .alias("n_truncated"),
        F.sum(lost).cast("long").alias("tokens_lost"),
        F.round(
            F.sum(lost).cast("double") / F.sum("n_tokens"), 6
        ).alias("loss_frac"),
    )



@register(
    "q319_scaling_law_subsets",
    allow_non_equi="deliberate 4-row broadcast threshold-spine theta join: nested scaling-law subsets require h < threshold per spine row",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(trim(text)),
                  '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
             ((doc_id % 2147483648) * 2654435761 + 1013904223)
               % 4294967291 % 1000 AS h
      FROM documents
    ), spine AS (
      SELECT * FROM (VALUES (100), (250), (500), (1000)) s(mille)
    )
    SELECT mille,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS subset_tokens
    FROM spine JOIN d ON d.h < spine.mille
    GROUP BY mille
    """,
)
def q319_scaling_law_subsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED dataset subsets for scaling-law sweeps (10% ⊂ 25% ⊂ 50% ⊂
    100%): membership is `hash(doc_id) < threshold`, so every smaller
    subset is contained in every larger one BY CONSTRUCTION — the
    property scaling-law fits require (a 25% run must see a superset of
    the 10% run's data) and random sampling per size does not give.
    The 4-row threshold spine broadcasts into one theta-join; the same
    deterministic affine hash family as q284/q306 keeps both engines
    bit-identical. At 100 TB each subset is a scan predicate, never a
    shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    # doc_id pre-reduced mod 2^31 so the prime multiply stays in int64
    h = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
         + F.lit(1013904223))
        % F.lit(4294967291)
        % F.lit(1000)
    )
    d = docs.select(
        F.size(toks).cast("long").alias("n_tokens"), h.alias("h")
    )
    spine = _lit_spine(spark, "mille", [100, 250, 500, 1000])
    return (
        F.broadcast(spine)
        .join(d, d.h < F.col("mille"))
        .groupBy("mille")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("subset_tokens"),
        )
    )



@register(
    "q321_skipgram_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), pos AS (
      SELECT doc_id, u.p AS p, w[u.p] AS center, len(w) AS n
      FROM t, UNNEST(generate_series(1, len(w))) AS u(p)
    ), pairs AS (
      SELECT center, ctx.tok AS context
      FROM pos, LATERAL (
        SELECT UNNEST([p - 2, p - 1, p + 1, p + 2]) AS q
      ) o, LATERAL (
        SELECT CASE WHEN o.q BETWEEN 1 AND n THEN
          (SELECT w[o.q] FROM t t2 WHERE t2.doc_id = pos.doc_id)
        END AS tok
      ) ctx
      WHERE ctx.tok IS NOT NULL
    )
    SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY center, context
    ORDER BY n DESC, center, context LIMIT 50
    """,
)
def q321_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair extraction, window=2 — the
    word2vec/SGNS training-pair generator: one position explode + four
    row-local array index lookups (the context IS adjacency in the same
    row's array; NO self-join, no window shuffle), then a count
    aggregation and TakeOrdered top-50. The per-row expansion factor is
    the constant 4, so a 100 TB corpus streams through map-side."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    t = docs.select(toks.alias("w"), F.size(toks).alias("n"))
    pos = t.select(
        "w",
        "n",
        F.posexplode("w").alias("p0", "center"),
    ).select("w", "n", (F.col("p0") + 1).alias("p"), "center")
    # F.get is 0-based and returns NULL out-of-bounds (element_at raises
    # on index 0, so p-2 at the array head would kill the job)
    ctx = F.explode(
        F.array(
            *[
                F.get("w", (F.col("p") + F.lit(o) - 1).cast("int"))
                for o in (-2, -1, 1, 2)
            ]
        )
    )
    pairs = pos.select("center", ctx.alias("context")).filter(
        F.col("context").isNotNull()
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "center", "context")
        .limit(50)
    )



@register(
    "q322_uncertainty_sampling",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(trim(text)),
                  '\\s+'), x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiou]')) AS BIGINT)
               AS n_vowels,
             n_chars
      FROM documents
    ), scored AS (
      SELECT doc_id,
             CAST(ROUND(2000000.0 * n_vowels / n_chars
                  + 1000000.0 * n_words / 200 - 1200000) AS BIGINT)
               AS logit_micro
      FROM f WHERE n_words > 0 AND n_chars > 0
    )
    SELECT doc_id, CAST(logit_micro AS BIGINT) AS logit_micro,
           CAST(ABS(logit_micro) AS BIGINT) AS margin_micro
    FROM scored
    ORDER BY ABS(logit_micro), doc_id LIMIT 20
    """,
)
def q322_uncertainty_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty sampling for active labeling: score every document
    with a cheap linear quality model (integer-micro logit — the q273
    classifier shape) and pick the 20 docs CLOSEST to the decision
    boundary (smallest |logit|) — the examples whose human labels
    improve the classifier fastest. Margin ordering is exact integer
    arithmetic; selection is TakeOrdered, never a global sort."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n_words = F.size(toks).cast("long")
    n_vowels = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiou]"), F.lit(0))
    ).cast("long")
    f = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_vowels.alias("n_vowels"),
        "n_chars",
    ).filter((F.col("n_words") > 0) & (F.col("n_chars") > 0))
    logit = F.round(
        F.lit(2_000_000.0) * F.col("n_vowels") / F.col("n_chars")
        + F.lit(1_000_000.0) * F.col("n_words") / F.lit(200)
        - F.lit(1_200_000.0)
    ).cast("long")
    scored = f.select("doc_id", logit.alias("logit_micro"))
    return (
        scored.select(
            "doc_id",
            "logit_micro",
            F.abs("logit_micro").alias("margin_micro"),
        )
        .orderBy("margin_micro", "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Class weights, JL random projection, seasonality strength, peak
# detection (q323-q326)
# ---------------------------------------------------------------------------



@register(
    "q327_video_container_metadata",
    oracle="""
    SELECT doc_id AS id,
           CAST(1000 * (1 + doc_id % 4) AS BIGINT) AS timescale,
           CAST(1000 * (1 + doc_id % 300) AS BIGINT) AS duration_ms,
           CAST(16 * (1 + doc_id % 120) AS BIGINT) AS width,
           CAST(16 * (1 + doc_id % 68) AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS n_tracks,
           TRUE AS parse_ok
    FROM documents
    """,
)
def q327_video_container_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata decode, end-to-end hash-checked
    (the q259 idiom for VIDEO): valid ISO-BMFF/MP4 payloads — spec-
    correct ftyp/moov/mvhd/trak/tkhd/mdat box trees — are synthesized on
    the executors with timescale/duration/dimensions derived from
    doc_id, then ``decode_video_metadata`` walks the ACTUAL box tree
    (pure Python over ISO/IEC 14496-12, no media library) to recover
    them; the oracle recomputes the expectations from the id formulas,
    so any mis-read byte offset in the box walk hash-mismatches.
    duration_ms is exact (synthesized durations are timescale
    multiples). Two chained Arrow-batched ``mapInPandas`` stages, zero
    shuffles, payloads never leave the executors — the 100 TB
    video-catalog backfill plan."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        decode_video_metadata,
        synthesize_video_assets,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    assets = synthesize_video_assets(docs, "doc_id")
    return decode_video_metadata(assets, "id", "payload")


# ---------------------------------------------------------------------------
# Storage encoding advice, association rules, cross-source score
# normalization (q328-q330)
# ---------------------------------------------------------------------------



@register(
    "q347_bigram_logprob",
    allow_non_equi="deliberate SINGLE-ROW broadcast cross join: attaching the vocabulary-size scalar for LM smoothing (same shape as q137)",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      FROM documents
    ), nz AS (
      SELECT doc_id, tk FROM toks WHERE len(tk) > 0
    ), big AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(tk) + 1),
               i -> struct_pack(
                 p := CASE WHEN i = 1 THEN '<s>' ELSE tk[i - 1] END,
                 c := tk[i]))) AS pc
      FROM nz
    ), b AS (
      SELECT doc_id, pc.p AS p, pc.c AS c FROM big
    ), mb AS (
      SELECT p, c, COUNT(*) AS cb FROM b GROUP BY p, c
    ), mp AS (
      SELECT p, COUNT(*) AS cp FROM b GROUP BY p
    ), vv AS (
      SELECT COUNT(DISTINCT c) AS v FROM b
    ), scored AS (
      SELECT b.doc_id, COUNT(*) AS n_tokens,
             SUM(ln((mb.cb + 1.0) / (mp.cp + vv.v))) AS lp
      FROM b JOIN mb USING (p, c) JOIN mp USING (p) CROSS JOIN vv
      GROUP BY b.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(lp / n_tokens, 6) AS avg_bigram_logprob
    FROM scored
    """,
)
def q347_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X277 — add-one-smoothed BIGRAM language model fit on the corpus
    itself, each document scored by mean token log-probability with a
    BOS context — the next step up from q137's unigram perplexity proxy
    and the actual filter shape (KenLM-style n-gram scoring) curation
    pipelines run when a trained LM isn't on the cluster.

    Plan: one zip_with builds each document's (prev, cur) pairs
    row-locally (no self-join); the bigram model is a hash aggregate on
    (p, c); scoring joins the token stream back to the model on the
    SAME (p, c) key (equi-join, AQE-skew-safe), the |contexts|-sized
    count table broadcasts, and the vocab-size scalar rides a 1-row
    cross join. Log floats round to 6dp for cross-engine hash
    stability (q137's policy)."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    base = docs.select("doc_id", toks.alias("_t")).filter(F.size("_t") > 0)
    prevs = F.concat(
        F.array(F.lit("<s>")), F.slice(F.col("_t"), 1, F.size("_t") - 1)
    )
    b = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                prevs,
                F.col("_t"),
                lambda p, c: F.struct(p.alias("p"), c.alias("c")),
            )
        ).alias("_pc"),
    ).select("doc_id", F.col("_pc.p").alias("p"), F.col("_pc.c").alias("c"))
    mb = b.groupBy("p", "c").agg(F.count(F.lit(1)).alias("cb"))
    mp = b.groupBy("p").agg(F.count(F.lit(1)).alias("cp"))
    vv = b.agg(F.countDistinct("c").alias("v"))
    scored = (
        b.join(mb, ["p", "c"])
        .join(F.broadcast(mp), "p")
        .crossJoin(F.broadcast(vv))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log((F.col("cb") + 1.0) / (F.col("cp") + F.col("v")))
            ).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("lp") / F.col("n_tokens"), 6).alias("avg_bigram_logprob"),
    )



@register(
    "q366_unimax_allocation",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross joins (corpus totals, "
        "capped-mass totals) onto the |sources|-bounded allocation "
        "relation - group-cardinality, never row-level"
    ),
    oracle="""
    WITH src AS (
      SELECT source, SUM(n_chars) AS tok FROM documents GROUP BY source
    ), tot AS (SELECT SUM(tok) AS total, COUNT(*) AS n FROM src),
    r AS (
      SELECT source, tok, 2 * tok AS cap,
             ROW_NUMBER() OVER (ORDER BY 2 * tok, source) AS rk,
             SUM(2 * tok) OVER (ORDER BY 2 * tok, source) - 2 * tok
               AS prefix_before
      FROM src
    ), flag AS (
      SELECT r.*, n, (18 * total) // 10 AS budget,
             CASE WHEN cap * (n - rk + 1)
                       <= (18 * total) // 10 - prefix_before
                  THEN 1 ELSE 0 END AS capped
      FROM r CROSS JOIN tot
    ), agg AS (
      SELECT SUM(CASE WHEN capped = 1 THEN cap ELSE 0 END) AS s_capped,
             SUM(1 - capped) AS n_unc
      FROM flag
    ), unc AS (
      SELECT f.*, s_capped, n_unc,
             CASE WHEN capped = 0 THEN
               ROW_NUMBER() OVER (PARTITION BY capped
                                  ORDER BY cap DESC, source)
             END AS rk_unc
      FROM flag f CROSS JOIN agg
    ), alloc AS (
      SELECT source, tok, cap,
             CASE WHEN capped = 1 THEN cap
                  ELSE (budget - s_capped) // GREATEST(n_unc, 1)
                       + CASE WHEN rk_unc <= (budget - s_capped)
                                             % GREATEST(n_unc, 1)
                              THEN 1 ELSE 0 END
             END AS allocation
      FROM unc
    )
    SELECT source, CAST(tok AS BIGINT) AS tokens,
           CAST(cap AS BIGINT) AS cap,
           CAST(allocation AS BIGINT) AS allocation,
           ROUND(CAST(allocation AS DOUBLE) / tok, 6) AS epochs_used
    FROM alloc
    """,
)
def q366_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X296 — UniMax sampling allocation (Chung et al. 2023): distribute
    a token budget across sources as uniformly as possible subject to a
    per-source epoch cap — the mixing rule that replaced
    temperature-sampling in PaLM-2-era multilingual pretraining.
    Water-filling closed form: sort sources by cap ascending; source at
    rank r is capped iff its cap ≤ the even split of what remains after
    all smaller caps are paid out (the predicate is provably monotone in
    r, so a per-row window test reproduces the iterative algorithm); the
    leftover splits evenly across uncapped sources, remainder to the
    largest caps first (q279 largest-remainder convention).

    Engine-exactness: token counts, caps, prefix sums, the capped
    predicate (integer cross-multiplication), the even split (floor
    div) and remainder distribution are ALL int64 — zero float until
    the final epochs_used display division. Budget = 1.8× corpus
    tokens, cap = 2 epochs.

    Scale: one groupBy collapses the corpus to |sources| rows; every
    window/join after that is on the bounded allocation relation."""
    docs = load(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.sum("n_chars").alias("tok"))
    tot = src.agg(
        F.sum("tok").alias("total"), F.count(F.lit(1)).alias("n")
    )
    w_rank = Window.orderBy(F.col("cap"), F.col("source"))
    r = src.withColumn("cap", 2 * F.col("tok")).select(
        "source",
        "tok",
        "cap",
        F.row_number().over(w_rank).alias("rk"),
        (F.sum("cap").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)) - F.col("cap")).alias(
            "prefix_before"
        ),
    )
    flag = (
        r.crossJoin(F.broadcast(tot))
        .withColumn("budget", F.expr("(18 * total) DIV 10"))
        .withColumn(
            "capped",
            F.when(
                F.col("cap") * (F.col("n") - F.col("rk") + 1)
                <= F.col("budget") - F.col("prefix_before"),
                1,
            ).otherwise(0),
        )
    )
    agg = flag.agg(
        F.sum(F.when(F.col("capped") == 1, F.col("cap")).otherwise(0)).alias(
            "s_capped"
        ),
        F.sum(1 - F.col("capped")).alias("n_unc"),
    )
    w_unc = Window.partitionBy("capped").orderBy(
        F.col("cap").desc(), F.col("source")
    )
    unc = flag.crossJoin(F.broadcast(agg)).withColumn(
        "rk_unc", F.when(F.col("capped") == 0, F.row_number().over(w_unc))
    )
    allocation = F.when(F.col("capped") == 1, F.col("cap")).otherwise(
        F.expr("(budget - s_capped) DIV GREATEST(n_unc, 1)")
        + F.when(
            F.col("rk_unc")
            <= F.expr("(budget - s_capped) % GREATEST(n_unc, 1)"),
            1,
        ).otherwise(0)
    )
    return unc.select(
        "source",
        F.col("tok").cast("long").alias("tokens"),
        F.col("cap").cast("long").alias("cap"),
        allocation.cast("long").alias("allocation"),
        F.round(allocation.cast("double") / F.col("tok"), 6).alias(
            "epochs_used"
        ),
    )



@register(
    "q377_vocab_growth_curve",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk
      FROM documents
    ), e AS (
      SELECT rnk, UNNEST(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> x <> ''))) AS tok
      FROM d
    ), fr AS (
      SELECT tok, MIN(rnk) AS first_rank FROM e GROUP BY tok
    ), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    bucketed AS (
      SELECT ((first_rank + 49) // 50) * 50 AS ck, COUNT(*) AS new_toks
      FROM fr GROUP BY 1
    ), spine AS (
      SELECT UNNEST(range(50, CAST(((n_docs + 49) // 50) * 50 + 1 AS BIGINT),
                          50)) AS ck
      FROM nd
    )
    SELECT CAST(s.ck AS BIGINT) AS checkpoint_docs,
           CAST(COALESCE(b.new_toks, 0) AS BIGINT) AS new_tokens,
           CAST(SUM(COALESCE(b.new_toks, 0))
                OVER (ORDER BY s.ck) AS BIGINT) AS vocab_size
    FROM spine s LEFT JOIN bucketed b ON b.ck = s.ck
    """,
)
def q377_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X307 — EXACT vocabulary-growth curve: distinct vocabulary size
    after the first k documents (doc_id order), at checkpoints of 50 —
    the curve whose Heaps'-law exponent q240 estimates by per-source
    log-log OLS; this computes the curve itself (a flattening curve
    means new data stops adding new language; near-linear growth flags
    noise/IDs, and the curve localizes WHERE growth breaks, which a
    fitted β cannot). Exact, not sampled: a token's contribution is its
    FIRST document rank, so the curve needs one min-aggregate per
    distinct token, not a cumulative-distinct scan.

    Scale: doc ranks come from the two-phase parallel prefix scan
    (`global_running_sum`, q360 pattern — no single-task global window
    over the corpus); per-token min is one hash aggregate; everything
    after lives on the checkpoint spine (n/50 rows), where the
    cumulative window is group-cardinality by construction."""
    from noaa_ais_glue_lakehouse_spark.operators.ordering import (
        global_running_sum,
    )

    docs = _spread(load(spark, sf_dir, "documents"))
    ranked = global_running_sum(
        docs.select("doc_id", "text").withColumn("_one", F.lit(1)),
        ["doc_id"],
        "_one",
        out_col="rnk",
    )
    e = ranked.select(
        "rnk",
        F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok"),
    )
    fr = e.groupBy("tok").agg(F.min("rnk").alias("first_rank"))
    bucketed = fr.groupBy(
        F.expr("((first_rank + 49) DIV 50) * 50").alias("ck")
    ).agg(F.count(F.lit(1)).alias("new_toks"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    spine = nd.select(
        F.explode(
            F.expr("sequence(50L, ((n_docs + 49) DIV 50) * 50, 50L)")
        ).alias("ck")
    )
    w = Window.orderBy("ck").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the global window here runs on the CHECKPOINT spine (n_docs/50
    # rows), not the corpus - bounded by construction
    return (
        spine.join(bucketed, "ck", "left")
        .select("ck", F.coalesce("new_toks", F.lit(0)).alias("new_toks"))
        .select(
            F.col("ck").cast("long").alias("checkpoint_docs"),
            F.col("new_toks").cast("long").alias("new_tokens"),
            F.sum("new_toks").over(w).cast("long").alias("vocab_size"),
        )
    )



@register(
    "q378_hll_distinct_portable",
    oracle="""
    WITH e AS (
      SELECT source, UNNEST(list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> x <> ''))) AS tok
      FROM documents
    ), h AS (
      SELECT source, tok,
             CAST(concat('0x', substr(md5(tok), 1, 2)) AS BIGINT) AS reg,
             CAST(concat('0x', substr(md5(tok), 3, 13)) AS BIGINT) AS v52
      FROM e
    ), regs AS (
      SELECT source, reg,
             MAX(CASE WHEN v52 = 0 THEN 53
                      ELSE 53 - length(bin(v52)) END) AS m_j
      FROM h GROUP BY source, reg
    ), agg AS (
      SELECT source,
             COUNT(*) AS n_present,
             SUM(9007199254740992 >> m_j) AS sum_u
      FROM regs GROUP BY source
    ), ex AS (
      SELECT source, COUNT(DISTINCT tok) AS n_exact FROM e GROUP BY source
    )
    SELECT a.source,
           CAST(x.n_exact AS BIGINT) AS n_exact,
           CAST(256 - a.n_present AS BIGINT) AS n_zero_regs,
           ROUND(
             CASE
               WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                    * 9007199254740992.0
                    / (a.sum_u + (256 - a.n_present) * 9007199254740992.0)
                    <= 640.0
                AND a.n_present < 256
               THEN 256.0 * ln(256.0 / GREATEST(256 - a.n_present, 1))
               ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                    * 9007199254740992.0
                    / (a.sum_u + (256 - a.n_present) * 9007199254740992.0)
             END, 2) AS hll_estimate
    FROM agg a JOIN ex x USING (source)
    """,
)
def q378_hll_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X308 — HyperLogLog distinct-token estimate per source with a
    PORTABLE register construction, upgrading the sketch family
    (q63/q102 are rows-only) to a fully oracle-checked member: the
    md5 hash family (q28/q175 convention) gives both engines identical
    registers, so the estimate itself — not just its error bound — is
    cross-engine reproducible. 256 registers (p=8): register = first 8
    hash bits, ρ = leading-zero count of the next 52 bits + 1 (via
    binary-representation length, exact integer).

    Engine-exactness: the harmonic sum Σ 2^−M_j is computed in integer
    units of 2⁻⁵³ — each term is the exact int64 (2⁵³ >> M_j), so the
    sum is order-independent; the HLL constant α_m·m² and the final
    division happen once, in one fixed double expression. The
    small-range linear-counting correction (E ≤ 2.5m with empty
    registers, Flajolet et al. 2007) applies on both engines; its ln()
    is the single libm call, displayed rounded to 2 dp. Exact distinct
    count is emitted alongside for error auditing.

    Scale: this is THE count-distinct for 100 TB — register state is
    256 int64s per group regardless of corpus size, map-side
    combinable; the exact countDistinct column is the test-scale audit
    and would be dropped at scale."""
    docs = load(spark, sf_dir, "documents")
    e = docs.select(
        "source",
        F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok"),
    )
    md = F.md5(F.col("tok"))
    h = e.select(
        "source",
        "tok",
        F.conv(F.substring(md, 1, 2), 16, 10).cast("long").alias("reg"),
        F.conv(F.substring(md, 3, 13), 16, 10).cast("long").alias("v52"),
    )
    regs = h.groupBy("source", "reg").agg(
        F.max(
            F.when(F.col("v52") == 0, F.lit(53)).otherwise(
                F.lit(53) - F.length(F.bin(F.col("v52")))
            )
        ).alias("m_j")
    )
    agg = regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftright(9007199254740992L, CAST(m_j AS INT))")).alias(
            "sum_u"
        ),
    )
    ex = e.groupBy("source").agg(F.countDistinct("tok").alias("n_exact"))
    raw_est = (
        "(0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0"
        " * 9007199254740992.0"
        " / (sum_u + (256 - n_present) * 9007199254740992.0)"
    )
    return agg.join(ex, "source").select(
        "source",
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.lit(256) - F.col("n_present")).cast("long").alias("n_zero_regs"),
        F.round(
            F.expr(
                f"CASE WHEN {raw_est} <= 640.0 AND n_present < 256"
                f" THEN 256.0 * ln(256.0 / GREATEST(256 - n_present, 1))"
                f" ELSE {raw_est} END"
            ),
            2,
        ).alias("hll_estimate"),
    )



@register(
    "q385_kmv_vocab_overlap",
    allow_non_equi=(
        "deliberate bounded OR-join attaching each source PAIR (<=190 "
        "rows) to its two 16-row sketches - pair-cardinality x sketch "
        "size, never corpus rows"
    ),
    oracle="""
    WITH t AS (
      SELECT DISTINCT source,
             UNNEST(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x <> '')) AS tok
      FROM documents
    ), h AS (
      SELECT DISTINCT source,
             CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h60
      FROM t
    ), sk AS (
      SELECT source, h60 FROM (
        SELECT source, h60,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h60) AS rk
        FROM h) WHERE rk <= 16
    ), prs AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM (SELECT DISTINCT source FROM sk) a
      JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
    ), mv AS (
      SELECT p.src_a, p.src_b, v.h60,
             MAX(CASE WHEN v.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN v.source = p.src_b THEN 1 ELSE 0 END) AS in_b
      FROM prs p JOIN sk v ON v.source = p.src_a OR v.source = p.src_b
      GROUP BY p.src_a, p.src_b, v.h60
    ), rkd AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b
                                   ORDER BY h60) AS rk,
             COUNT(*) OVER (PARTITION BY src_a, src_b) AS n_merged
      FROM mv
    ), agg AS (
      SELECT src_a, src_b,
             LEAST(16, MAX(n_merged)) AS km,
             MAX(CASE WHEN rk = LEAST(16, n_merged) THEN h60 END) AS theta,
             SUM(CASE WHEN rk <= LEAST(16, n_merged)
                       AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
               AS shared,
             MAX(n_merged) AS n_merged
      FROM rkd GROUP BY src_a, src_b
    )
    SELECT src_a, src_b,
           CAST(km AS BIGINT) AS km,
           CAST(shared AS BIGINT) AS shared_topk,
           ROUND(CAST(shared AS DOUBLE) / km, 6) AS kmv_jaccard,
           ROUND(CASE WHEN n_merged < 16 THEN CAST(n_merged AS DOUBLE)
                 ELSE (km - 1) * 1152921504606846976.0 / theta END, 2)
             AS est_union,
           ROUND((CAST(shared AS DOUBLE) / km)
                 * CASE WHEN n_merged < 16 THEN CAST(n_merged AS DOUBLE)
                   ELSE (km - 1) * 1152921504606846976.0 / theta END, 2)
             AS est_inter
    FROM agg
    """,
)
def q385_kmv_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X315 — pairwise source-vocabulary overlap from K-MINIMUM-VALUES
    sketches (Bar-Yossef et al. 2002): the distinct sketch that, unlike
    HLL (q378), supports SET OPERATIONS — union via merged top-k,
    intersection via the Jaccard share of the merged threshold region —
    so cross-source overlap at 100 TB costs O(k) state per source
    instead of the |vocab|-row token join (q166 is that exact anchor).
    Portable md5 hash family (q175/q378 convention): both engines hold
    IDENTICAL sketches, so estimates — not just error bounds — are
    hash-checked.

    Estimator: sketch = 16 smallest distinct 60-bit token hashes per
    source; for a pair, km = min(16, |merged values|), θ = km-th
    smallest merged value, ρ = |values ≤ θ in both sketches|/km,
    U ≈ (km−1)·2⁶⁰/θ (or the exact merged count when the sketches are
    complete), I ≈ ρ·U. All sketch arithmetic is exact integers; the
    two estimates are one-shot double expressions rounded once.

    Scale: one corpus-sized distinct on (source, token); sketches come
    from a per-source window over the distinct-hash relation (k rows
    survive per source, map-side-prunable); everything after is
    pair-cardinality (≤190 rows × 32 sketch values)."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    ).distinct()
    h = t.select(
        "source",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
        .cast("long")
        .alias("h60"),
    ).distinct()
    w = Window.partitionBy("source").orderBy("h60")
    sk = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 16)
        .select("source", "h60")
    )
    srcs = sk.select("source").distinct()
    prs = (
        srcs.select(F.col("source").alias("src_a"))
        .join(
            srcs.select(F.col("source").alias("src_b")),
            F.col("src_a") < F.col("src_b"),
        )
    )
    mv = (
        prs.join(
            F.broadcast(sk.select(F.col("source").alias("s"), "h60")),
            (F.col("s") == F.col("src_a")) | (F.col("s") == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "h60")
        .agg(
            F.max(
                F.when(F.col("s") == F.col("src_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("s") == F.col("src_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wp = Window.partitionBy("src_a", "src_b").orderBy("h60")
    wc = Window.partitionBy("src_a", "src_b")
    rkd = mv.select(
        "src_a",
        "src_b",
        "h60",
        "in_a",
        "in_b",
        F.row_number().over(wp).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n_merged"),
    )
    agg = rkd.groupBy("src_a", "src_b").agg(
        F.least(F.lit(16), F.max("n_merged")).alias("km"),
        F.max(
            F.when(
                F.col("rk") == F.least(F.lit(16), F.col("n_merged")),
                F.col("h60"),
            )
        ).alias("theta"),
        F.sum(
            F.when(
                (F.col("rk") <= F.least(F.lit(16), F.col("n_merged")))
                & (F.col("in_a") == 1)
                & (F.col("in_b") == 1),
                1,
            ).otherwise(0)
        ).alias("shared"),
        F.max("n_merged").alias("n_merged"),
    )
    u_est = (
        "CASE WHEN n_merged < 16 THEN CAST(n_merged AS DOUBLE)"
        " ELSE (km - 1) * 1152921504606846976.0 / theta END"
    )
    return agg.select(
        "src_a",
        "src_b",
        F.col("km").cast("long").alias("km"),
        F.col("shared").cast("long").alias("shared_topk"),
        F.round(F.col("shared").cast("double") / F.col("km"), 6).alias(
            "kmv_jaccard"
        ),
        F.expr(f"ROUND({u_est}, 2)").alias("est_union"),
        F.expr(
            f"ROUND((CAST(shared AS DOUBLE) / km) * ({u_est}), 2)"
        ).alias("est_inter"),
    )



@register(
    "q395_span_corruption",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, t.tok, CAST(t.pos AS BIGINT) AS pos
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS tk
        FROM documents
      ), LATERAL (
        SELECT UNNEST(tk) AS tok,
               UNNEST(range(0, len(tk))) AS pos
      ) t
    ), flagged AS (
      SELECT doc_id, tok, pos,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':'
                  || CAST(pos AS VARCHAR)), 1, 2)) AS BIGINT) < 38 AS masked
      FROM toks
    ), m AS (
      SELECT doc_id, tok, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS grp
      FROM flagged WHERE masked
    ), spans AS (
      SELECT doc_id, tok, pos, grp,
             DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY grp) - 1
               AS span_id,
             MIN(pos) OVER (PARTITION BY doc_id, grp) AS span_start
      FROM m
    ), corrupted_pieces AS (
      SELECT doc_id, pos, tok AS piece
      FROM flagged WHERE NOT masked
      UNION ALL
      SELECT doc_id, pos,
             '<X' || CAST(span_id AS VARCHAR) || '>' AS piece
      FROM spans WHERE pos = span_start
    ), target_pieces AS (
      SELECT doc_id, pos,
             CASE WHEN pos = span_start
                  THEN '<X' || CAST(span_id AS VARCHAR) || '> ' || tok
                  ELSE tok END AS piece
      FROM spans
    ), c AS (
      SELECT doc_id, md5(string_agg(piece, ' ' ORDER BY pos))
               AS corrupted_md5
      FROM corrupted_pieces GROUP BY doc_id
    ), t2 AS (
      SELECT doc_id,
             md5(string_agg(piece, ' ' ORDER BY pos)) AS targets_md5,
             CAST(COUNT(*) AS BIGINT) AS n_masked,
             CAST(COUNT(DISTINCT span_start) AS BIGINT) AS n_spans
      FROM target_pieces
      JOIN spans USING (doc_id, pos)
      GROUP BY doc_id
    )
    SELECT c.doc_id, c.corrupted_md5, t2.targets_md5, t2.n_spans,
           t2.n_masked
    FROM c JOIN t2 USING (doc_id)
    """,
)
def q395_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X325 — T5-STYLE SPAN CORRUPTION (Raffel et al. 2020 §3.1.4): the
    denoising-pretraining transform — ~15% of token positions masked by
    a DETERMINISTIC public hash (first md5 byte of doc_id:pos < 38),
    adjacent masked positions merged into numbered sentinel spans, the
    corrupted input keeping <Xn> where each span was and the target
    sequence carrying <Xn> + the removed tokens. Seeded-by-hash means
    the augmentation is reproducible across reruns AND engines — both
    sides build byte-identical corrupted/target strings (compared by
    md5), the property that makes augmented corpora cacheable and
    auditable instead of RNG-dependent. Docs with no masked position
    drop out (inner join), matching the trainer convention of skipping
    unmasked examples.

    Plan: posexplode → hash flag → gaps-and-islands (pos − rank) for
    span merge → two ordered reassemblies via array_sort(collect_list)
    (DuckDB mirrors with ORDER BY string_agg). One shuffle on doc_id
    feeds every window; reassembly reuses the same clustering.

    Scale: everything is per-document; the shuffle carries (doc, pos,
    token) — linear in corpus tokens, the same transport as the gram
    family with `_spread` available for single-split corpora."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokenize(F.col("text"))).alias("pos", "tok"),
    )
    flagged = toks.select(
        "doc_id",
        "tok",
        F.col("pos").cast("long").alias("pos"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("doc_id").cast("string"),
                            F.col("pos").cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long")
            < 38
        ).alias("masked"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    m = flagged.filter("masked").withColumn(
        "grp", F.col("pos") - F.row_number().over(wdoc)
    )
    spans = m.select(
        "doc_id",
        "tok",
        "pos",
        (
            F.dense_rank().over(Window.partitionBy("doc_id").orderBy("grp"))
            - 1
        ).alias("span_id"),
        F.min("pos")
        .over(Window.partitionBy("doc_id", "grp"))
        .alias("span_start"),
    )
    corrupted_pieces = flagged.filter(~F.col("masked")).select(
        "doc_id", "pos", F.col("tok").alias("piece")
    ).unionByName(
        spans.filter(F.col("pos") == F.col("span_start")).select(
            "doc_id",
            "pos",
            F.concat(
                F.lit("<X"), F.col("span_id").cast("string"), F.lit(">")
            ).alias("piece"),
        )
    )
    target_pieces = spans.select(
        "doc_id",
        "pos",
        "span_start",
        F.when(
            F.col("pos") == F.col("span_start"),
            F.concat(
                F.lit("<X"),
                F.col("span_id").cast("string"),
                F.lit("> "),
                F.col("tok"),
            ),
        )
        .otherwise(F.col("tok"))
        .alias("piece"),
    )

    def _joined(df):
        return F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "piece"))
                    ),
                    lambda s: s.piece,
                ),
                " ",
            )
        )

    c = corrupted_pieces.groupBy("doc_id").agg(
        _joined(None).alias("corrupted_md5")
    )
    t2 = target_pieces.groupBy("doc_id").agg(
        _joined(None).alias("targets_md5"),
        F.count(F.lit(1)).cast("long").alias("n_masked"),
        F.countDistinct("span_start").cast("long").alias("n_spans"),
    )
    return c.join(t2, "doc_id").select(
        "doc_id", "corrupted_md5", "targets_md5", "n_spans", "n_masked"
    )



@register(
    "q396_kneser_ney_logprob",
    allow_non_equi=(
        "deliberate SINGLE-ROW broadcast cross join: attaching the "
        "distinct-bigram-count scalar for the continuation term (same "
        "shape as q347's vocabulary scalar)"
    ),
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS tk
      FROM documents
    ), nz AS (
      SELECT doc_id, tk FROM toks WHERE len(tk) > 0
    ), big AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(tk) + 1),
               i -> struct_pack(
                 p := CASE WHEN i = 1 THEN '<s>' ELSE tk[i - 1] END,
                 c := tk[i]))) AS pc
      FROM nz
    ), b AS (
      SELECT doc_id, pc.p AS p, pc.c AS c FROM big
    ), mb AS (
      SELECT p, c, COUNT(*) AS cb FROM b GROUP BY p, c
    ), mp AS (
      SELECT p, SUM(cb) AS cp, COUNT(*) AS fanout FROM mb GROUP BY p
    ), cont AS (
      SELECT c, COUNT(*) AS n_left FROM mb GROUP BY c
    ), tot AS (
      SELECT COUNT(*) AS n_bigram_types FROM mb
    ), scored AS (
      SELECT b.doc_id, COUNT(*) AS n_tokens,
             SUM(ln((mb.cb - 0.75) / mp.cp
                    + (0.75 * mp.fanout / mp.cp)
                      * (CAST(cont.n_left AS DOUBLE) / tot.n_bigram_types)))
               AS lp
      FROM b
      JOIN mb USING (p, c) JOIN mp USING (p) JOIN cont USING (c)
      CROSS JOIN tot
      GROUP BY b.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(lp / n_tokens, 6) AS avg_kn_logprob
    FROM scored
    """,
)
def q396_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X326 — interpolated KNESER-NEY bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1998 eq. 4.3) — the differentiated twin of q347's
    add-one model (its docstring is this one's anchor): instead of
    uniform +1 smoothing, absolute discounting D=0.75 with the mass
    redistributed by CONTINUATION probability — how many distinct
    contexts a word follows (n_left/|bigram types|), the correction
    that stops frequent-but-context-locked words ("francisco") from
    stealing probability. This is the actual KenLM default smoother,
    i.e. what a quality-filter LM scores with in production pipelines.

    Every count (cb, cp, fanout = N1+(p·), n_left = N1+(·c),
    |bigram types|) is an exact int64 relational aggregate; the model
    is self-fit so every scored bigram has cb ≥ 1 and the discounted
    term stays positive (cb − 0.75 > 0) — no backoff branch needed.
    Per-doc mean log-prob follows q347's rounding convention.

    Plan: identical transport to q347 — row-local bigram construction,
    hash-agg model on (p, c), the context/continuation rollups derive
    from the (p, c) model relation (bounded by |bigram types|, NOT the
    corpus), scoring joins the token stream to the model on (p, c).

    Scale: one corpus-linear shuffle on (p, c) plus model-sized
    rollups; the continuation statistics are free once mb exists."""
    docs = load(spark, sf_dir, "documents")
    nz = docs.select("doc_id", tokenize(F.col("text")).alias("tk")).filter(
        F.size("tk") > 0
    )
    b = nz.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk")),
                lambda i: F.struct(
                    F.when(i == 1, F.lit("<s>"))
                    .otherwise(F.element_at(F.col("tk"), i - 1))
                    .alias("p"),
                    F.element_at(F.col("tk"), i).alias("c"),
                ),
            )
        ).alias("pc"),
    ).select("doc_id", F.col("pc.p").alias("p"), F.col("pc.c").alias("c"))
    mb = b.groupBy("p", "c").agg(F.count(F.lit(1)).alias("cb"))
    mp = mb.groupBy("p").agg(
        F.sum("cb").alias("cp"), F.count(F.lit(1)).alias("fanout")
    )
    cont = mb.groupBy("c").agg(F.count(F.lit(1)).alias("n_left"))
    tot = mb.agg(F.count(F.lit(1)).alias("n_bigram_types"))
    prob = (
        (F.col("cb") - 0.75) / F.col("cp")
        + (0.75 * F.col("fanout") / F.col("cp"))
        * (
            F.col("n_left").cast("double")
            / F.col("n_bigram_types")
        )
    )
    scored = (
        b.join(mb, ["p", "c"])
        .join(mp, "p")
        .join(cont, "c")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(prob)).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("lp") / F.col("n_tokens"), 6).alias("avg_kn_logprob"),
    )



@register("q407_mixed_language_audit", oracle=_mixed_lang_oracle())
def q407_mixed_language_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X337 — WITHIN-DOCUMENT language segmentation audit: language-ID
    (q31's marker heuristic) applied per 20-token CHUNK, rolled to a
    per-document profile — chunk count, distinct detected languages,
    majority language, mixed flag. Doc-level langid (q31) averages a
    polyglot document into one label; chunk-level detection is how
    curation pipelines catch code-switched/concatenated documents that
    pollute monolingual training mixes (the CCNet/ROOTS per-paragraph
    langid step; chunks stand in for paragraphs since the corpus is
    single-line). Majority ties break on (count desc, lang asc) via the
    combinable min-struct trick (q188's mode); 'und' chunks never vote.

    Scale: one (doc, chunk) hash aggregate over the exploded token
    stream (map-side combinable conditional sums), then a |docs|-sized
    rollup — the gram-family transport with a bounded marker table, no
    joins on the big side."""
    docs = load(spark, sf_dir, "documents")
    counts, case = _chunk_langid_case()
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("tk")).filter(
        F.size("tk") > 0
    )
    e = toks.select(
        "doc_id", F.posexplode("tk").alias("pos", "tok")
    ).select("doc_id", (F.col("pos") / 20).cast("long").alias("chunk"), "tok")
    cc = e.groupBy("doc_id", "chunk").agg(
        *[
            F.expr(frag.strip()).alias(f"c_{la}")
            for frag, la in zip(
                [
                    "SUM(CASE WHEN tok IN ("
                    + ",".join(f"'{w}'" for w in LANG_MARKERS[la])
                    + ") THEN 1 ELSE 0 END)"
                    for la in LANG_MARKERS
                ],
                list(LANG_MARKERS),
            )
        ]
    )
    g = cc.select("doc_id", "chunk", F.expr(case).alias("guess"))
    known = (
        g.filter(F.col("guess") != "und")
        .groupBy("doc_id", "guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    roll = known.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.min(F.struct((-F.col("n")).alias("neg"), "guess")).alias("m"),
    )
    return (
        toks.join(roll, "doc_id", "left")
        .select(
            "doc_id",
            F.ceil(F.size("tk") / 20.0).cast("long").alias("n_chunks"),
            F.coalesce("n_langs", F.lit(0)).cast("long").alias("n_langs"),
            F.coalesce(F.col("m.guess"), F.lit("und")).alias(
                "majority_lang"
            ),
            F.when(F.coalesce("n_langs", F.lit(0)) >= 2, 1)
            .otherwise(0)
            .cast("long")
            .alias("mixed"),
        )
    )



@register(
    "q413_negative_sampling",
    allow_non_equi=(
        "one 1-row scalar-broadcast crossJoin attaching the total-draw "
        "count onto the vocab-grain draw summary; the CDF itself is an "
        "equi-join on quantized slots, never a range join"
    ),
    oracle="""
    WITH pos AS (
      SELECT doc_id, u.p AS p, w[u.p] AS tok
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
      ), UNNEST(generate_series(1, len(w))) AS u(p)
    ), vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(FLOOR(POW(CAST(COUNT(*) AS DOUBLE), 0.75) * 1000.0)
                  AS BIGINT) AS w_int
      FROM pos GROUP BY tok
    ), cdf AS (
      SELECT tok, n, w_int,
             CAST(SUM(w_int) OVER (ORDER BY tok) AS BIGINT) AS hi,
             CAST(SUM(w_int) OVER (ORDER BY tok) - w_int AS BIGINT) AS lo
      FROM vocab
    ), tot AS (
      SELECT MAX(hi) AS t FROM cdf
    ), slot_map AS (
      SELECT c.tok, c.lo, c.hi, u.s AS slot
      FROM cdf c, tot,
           UNNEST(generate_series(c.lo * 1024 // tot.t,
                                  (c.hi - 1) * 1024 // tot.t)) AS u(s)
    ), draws AS (
      SELECT CAST(concat('0x', substr(md5(concat(CAST(p.doc_id AS VARCHAR),
                   ':', CAST(p.p AS VARCHAR), ':', CAST(k.k AS VARCHAR))),
                   1, 13)) AS BIGINT) % tot.t AS u,
             tot.t AS t
      FROM pos p, tot, UNNEST([1, 2]) AS k(k)
    ), hits AS (
      SELECT m.tok, d.t
      FROM draws d
      JOIN slot_map m ON m.slot = d.u * 1024 // d.t
      WHERE d.u >= m.lo AND d.u < m.hi
    ), summary AS (
      SELECT tok, CAST(MAX(t) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS draws
      FROM hits GROUP BY tok
    ), total_draws AS (
      SELECT CAST(SUM(draws) AS BIGINT) AS td FROM summary
    )
    SELECT s.tok AS token, v.n AS n_freq, s.draws,
           ROUND(CAST(v.w_int AS DOUBLE)
                 / (SELECT MAX(hi) FROM cdf), 6) AS expected_share,
           ROUND(CAST(s.draws AS DOUBLE) / total_draws.td, 6)
             AS observed_share
    FROM summary s JOIN vocab v ON v.tok = s.tok, total_draws
    ORDER BY s.draws DESC, s.tok
    LIMIT 50
    """,
)
def q413_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X343 — WORD2VEC NEGATIVE SAMPLING from the unigram^0.75
    distribution (Mikolov et al. 2013): two hash-seeded negatives per
    token occurrence, drawn by inverse-CDF over integer-quantized
    freq^0.75 weights. The draw is NOT a range join: the cumulative
    distribution is quantized into 1024 slots, each token is exploded
    onto the slots its [lo, hi) interval overlaps (|vocab| + 1024 rows
    total), and a draw equi-joins on floor(u·1024/T) then exact-filters
    lo <= u < hi — the inverse-CDF-as-broadcast-equi-join pattern that
    keeps alias-table-style sampling shuffle-free at corpus scale (the
    q321 skip-gram generator's missing other half). CDF weights are
    int64 (floor(freq^0.75·1000)), so interval bounds, slot ids and
    the membership filter are all exact integer arithmetic; draws are
    md5(doc:pos:k)-seeded and engine-identical.

    Scale: vocab aggregate (map-side combine), a |vocab|+1024-row
    broadcast slot table, and one token-grain summary shuffle; the
    per-occurrence draw stream never shuffles before aggregation."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.lower(F.trim("text")), r"\s+").alias("w"),
    )
    pos = (
        toks.select("doc_id", F.posexplode("w").alias("p0", "tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    )
    vocab = pos.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).withColumn(
        "w_int",
        F.floor(F.pow(F.col("n").cast("double"), 0.75) * 1000.0).cast("long"),
    )
    wt = Window.orderBy("tok")
    # the CDF (vocab-sized) feeds the total, the slot table AND — via
    # the total — the draw stream; uncached, each reference re-ran the
    # tokenize→vocab→window pipeline (9 executed scans; round 11,
    # bounded cache registry)
    cdf = query_scoped_cache(
        vocab.select(
            "tok",
            "n",
            "w_int",
            F.sum("w_int").over(wt).alias("hi"),
            (F.sum("w_int").over(wt) - F.col("w_int")).alias("lo"),
        )
    )
    tot = query_scoped_cache(cdf.agg(F.max("hi").alias("t")))
    slot_map = (
        cdf.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "lo",
            "hi",
            F.explode(
                F.sequence(
                    (F.col("lo") * 1024 / F.col("t")).cast("long"),
                    ((F.col("hi") - 1) * 1024 / F.col("t")).cast("long"),
                )
            ).alias("slot"),
        )
    )
    draws = (
        pos.crossJoin(F.broadcast(tot))
        .select(
            "t",
            F.explode(F.array(F.lit(1), F.lit(2))).alias("k"),
            "doc_id",
            "p",
        )
        .select(
            "t",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                F.col("p").cast("string"),
                                F.lit(":"),
                                F.col("k").cast("string"),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("t")
            ).alias("u"),
        )
    )
    hits = (
        draws.withColumn(
            "slot", F.expr("(u * 1024) DIV t")
        )
        .join(F.broadcast(slot_map), "slot")
        .filter((F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
    )
    summary = hits.groupBy("tok").agg(
        F.max("t").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("draws"),
    )
    total_draws = summary.agg(F.sum("draws").cast("long").alias("td"))
    return (
        summary.join(F.broadcast(vocab.select("tok", "n", "w_int")), "tok")
        .crossJoin(F.broadcast(total_draws))
        .select(
            F.col("tok").alias("token"),
            F.col("n").alias("n_freq"),
            "draws",
            F.round(
                F.col("w_int").cast("double") / F.col("t"), 6
            ).alias("expected_share"),
            F.round(
                F.col("draws").cast("double") / F.col("td"), 6
            ).alias("observed_share"),
        )
        .orderBy(F.desc("draws"), "token")
        .limit(50)
    )


# shared VERBATIM tile-y expression (Web-Mercator / slippy-map tiles at
# zoom 6): both engines evaluate the same text, so the transcendental
# chain (tan/ln on clamped latitude) is IEEE-identical rowwise.

@register(
    "q427_unseen_vocab_estimate",
    oracle="""
    WITH toks AS (
      SELECT u.tok FROM (
        SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
      ), UNNEST(w) AS u(tok)
    ), vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ), fof AS (
      SELECT n AS freq, CAST(COUNT(*) AS BIGINT) AS f FROM vocab GROUP BY n
    ), m AS (
      SELECT CAST(SUM(freq * f) AS BIGINT) AS n_tokens,
             CAST(SUM(f) AS BIGINT) AS v_obs,
             CAST(COALESCE(MAX(CASE WHEN freq = 1 THEN f END), 0)
                  AS BIGINT) AS f1,
             CAST(COALESCE(MAX(CASE WHEN freq = 2 THEN f END), 0)
                  AS BIGINT) AS f2
      FROM fof
    )
    SELECT n_tokens, v_obs, f1, f2,
           ROUND(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6)
             AS good_turing_coverage,
           ROUND(CAST(v_obs AS DOUBLE)
                 + CAST(f1 AS DOUBLE) * f1 / (2.0 * GREATEST(f2, 1)), 6)
             AS chao1_vocab,
           ROUND((CAST(v_obs AS DOUBLE)
                  + CAST(f1 AS DOUBLE) * f1 / (2.0 * GREATEST(f2, 1))
                  - v_obs)
                 / (CAST(v_obs AS DOUBLE)
                    + CAST(f1 AS DOUBLE) * f1 / (2.0 * GREATEST(f2, 1))), 6)
             AS unseen_vocab_share
    FROM m
    """,
)
def q427_unseen_vocab_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X357 — UNSEEN-VOCABULARY ESTIMATION: Good–Turing sample coverage
    (1 − f1/N — the probability mass the corpus has NOT yet shown you,
    Good 1953) and the Chao1 richness estimator (V + f1²/2f2, Chao
    1984) from the frequency-of-frequencies profile. This answers the
    scaling question Heaps'-law extrapolation (q240) fits empirically
    and KN smoothing (q396) assumes implicitly: how much vocabulary is
    MISSING from the corpus and how much probability mass new data
    will spend on never-seen tokens — the collect-more-data-or-not
    signal for tokenizer and LM training. Everything folds from exact
    int64 (token counts → frequency-of-frequency counts → f1, f2);
    the three published estimates are single float expressions with
    GREATEST(f2, 1) guarding the no-doubleton degenerate corpus.

    Scale: two map-side-combinable aggregates (token grain, then
    frequency-of-frequency grain — at most |max freq| rows), then a
    1-row fold."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("n"))
    fof = vocab.groupBy(F.col("n").alias("freq")).agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    m = fof.agg(
        F.sum(F.col("freq") * F.col("f")).cast("long").alias("n_tokens"),
        F.sum("f").cast("long").alias("v_obs"),
        F.coalesce(F.max(F.when(F.col("freq") == 1, F.col("f"))), F.lit(0))
        .cast("long")
        .alias("f1"),
        F.coalesce(F.max(F.when(F.col("freq") == 2, F.col("f"))), F.lit(0))
        .cast("long")
        .alias("f2"),
    )
    chao1 = F.col("v_obs").cast("double") + F.col("f1").cast(
        "double"
    ) * F.col("f1") / (2.0 * F.greatest(F.col("f2"), F.lit(1)))
    return m.select(
        "n_tokens",
        "v_obs",
        "f1",
        "f2",
        F.round(
            1.0 - F.col("f1").cast("double") / F.col("n_tokens"), 6
        ).alias("good_turing_coverage"),
        F.round(chao1, 6).alias("chao1_vocab"),
        F.round((chao1 - F.col("v_obs")) / chao1, 6).alias(
            "unseen_vocab_share"
        ),
    )




@register(
    "q454_source_scorecard",
    oracle=r"""
    WITH base AS (
      SELECT source, lang, doc_id,
             md5(text) AS h,
             CAST(len(list_filter(string_split_regex(lower(trim(text)),
                  '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
             CAST(n_chars AS BIGINT) AS n_chars
      FROM documents
    ), per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM base GROUP BY source
    ), langs AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nl,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY COUNT(*) DESC, lang) AS rk
      FROM base GROUP BY source, lang
    )
    SELECT p.source, p.n_docs,
           ROUND(1.0 - CAST(p.n_unique AS DOUBLE) / p.n_docs, 6)
             AS exact_dup_rate,
           CAST((p.total_tokens * 1000000) // p.n_docs AS BIGINT)
             AS mean_tokens_e6,
           CAST((p.total_chars * 1000000)
                // GREATEST(p.total_tokens, 1) AS BIGINT)
             AS chars_per_token_e6,
           l.lang AS majority_lang,
           ROUND(CAST(l.nl AS DOUBLE) / p.n_docs, 6) AS majority_lang_share
    FROM per p JOIN langs l ON l.source = p.source AND l.rk = 1
    """,
)
def q454_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X384 — PER-SOURCE DATA-QUALITY SCORECARD: the one-scan summary a
    corpus curator reads before setting mixture weights (q184/q246) —
    per source: exact-duplicate rate (md5-distinct vs rows, the q25
    signal at audit grain), token volume, mean doc length and
    chars-per-token (micro-int floor division — a tokenizer-cost and
    boilerplate proxy), majority language and its share (declared-label
    concentration; a low share flags mixed or mislabeled feeds for the
    q407 chunk-level audit). Complements q213's corpus-level data card
    with the per-feed grain acquisition decisions happen at.

    Scale: one pass to source grain (md5 + token count are row-local),
    one (source, lang) rollup with a group-grain top-1 window; no
    joins wider than the |sources|-row relations."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    base = docs.select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    per = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("h").cast("long").alias("n_unique"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    langs = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("nl"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("nl"), "lang")
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return per.join(langs, "source").select(
        "source",
        "n_docs",
        F.round(
            1.0 - F.col("n_unique").cast("double") / F.col("n_docs"), 6
        ).alias("exact_dup_rate"),
        F.expr("(total_tokens * 1000000) DIV n_docs").alias("mean_tokens_e6"),
        F.expr(
            "(total_chars * 1000000) DIV GREATEST(total_tokens, 1)"
        ).alias("chars_per_token_e6"),
        F.col("lang").alias("majority_lang"),
        F.round(F.col("nl").cast("double") / F.col("n_docs"), 6).alias(
            "majority_lang_share"
        ),
    )


@register(
    "q458_mattr_lexical_diversity",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, t.tok, CAST(t.pos AS BIGINT) + 1 AS p
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS tk
        FROM documents
      ), LATERAL (
        SELECT UNNEST(tk) AS tok,
               UNNEST(range(0, len(tk))) AS pos
      ) t
    ), n AS (
      SELECT doc_id, CAST(MAX(p) AS BIGINT) AS n FROM toks GROUP BY doc_id
    ), lagged AS (
      SELECT toks.doc_id, p, n.n,
             COALESCE(LAG(p) OVER (PARTITION BY toks.doc_id, tok
                                   ORDER BY p), 0) AS q
      FROM toks JOIN n USING (doc_id)
    ), contrib AS (
      SELECT doc_id, n,
             GREATEST(0, LEAST(p, n - 49)
                         - GREATEST(p - 49, q + 1, 1) + 1) AS c
      FROM lagged WHERE n >= 50
    )
    SELECT doc_id, n AS n_tokens,
           CAST(SUM(c) AS BIGINT) AS distinct_window_sum,
           ROUND(CAST(SUM(c) AS DOUBLE) / (50.0 * (n - 49)), 6) AS mattr_50
    FROM contrib GROUP BY doc_id, n
    """,
)
def q458_mattr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X388 — MATTR (Moving-Average Type-Token Ratio, Covington &
    McFall 2010) at window 50, computed EXACTLY without materializing
    any window: plain TTR (q164's shape) confounds diversity with
    document length; MATTR fixes that by averaging TTR over every
    50-token window — naively O(n·W) sliding distinct-counts. The
    relational closed form here: an occurrence at position p whose
    previous same-token occurrence sits at q is the window's FIRST of
    its type exactly for starts s ∈ [max(p−49, q+1, 1), min(p, n−49)],
    so Σ_windows distinct(window) = Σ_occurrences of that interval
    length — ONE lag window over (doc, token) and an integer sum
    replace the quadratic sweep, and MATTR = sum / (50·(n−49)) is
    exact to the rounding. The training-data use: length-robust
    repetitiveness screening that q82's duplicate-n-gram rate and
    q164's raw TTR both misread on long docs.

    Scale: posexplode to token grain, one (doc, token)-partitioned lag,
    one doc-grain rollup — linear, no window materialization."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "tok")
    ).select("doc_id", (F.col("pos") + 1).cast("long").alias("p"), "tok")
    n = toks.groupBy("doc_id").agg(F.max("p").cast("long").alias("n"))
    lagged = (
        toks.join(n, "doc_id")
        .filter(F.col("n") >= 50)
        .select(
            "doc_id",
            "p",
            "n",
            F.coalesce(
                F.lag("p").over(
                    Window.partitionBy("doc_id", "tok").orderBy("p")
                ),
                F.lit(0),
            ).alias("q"),
        )
    )
    contrib = lagged.select(
        "doc_id",
        "n",
        F.greatest(
            F.lit(0),
            F.least(F.col("p"), F.col("n") - 49)
            - F.greatest(F.col("p") - 49, F.col("q") + 1, F.lit(1))
            + 1,
        ).alias("c"),
    )
    return contrib.groupBy("doc_id", "n").agg(
        F.sum("c").cast("long").alias("distinct_window_sum"),
        F.round(
            F.sum("c").cast("double") / (50.0 * (F.col("n") - 49)), 6
        ).alias("mattr_50"),
    ).select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "distinct_window_sum",
        "mattr_50",
    )


@register(
    "q459_burrows_delta",
    allow_non_equi=(
        "the |sources|-row z-profile table self-joins on src_a < src_b "
        "(190 pairs, group-cardinality); the 50-word vocabulary and the "
        "1-row source-count scalar broadcast"
    ),
    oracle=r"""
    WITH toks AS (
      SELECT source, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> x <> '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok FROM toks GROUP BY tok
      ORDER BY COUNT(*) DESC, tok LIMIT 50
    ), st AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS total FROM toks
      GROUP BY source
    ), cnt AS (
      SELECT t.source, t.tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks t JOIN vocab v ON t.tok = v.tok
      GROUP BY t.source, t.tok
    ), f AS (
      SELECT st.source, v.tok,
             COALESCE(cnt.c, 0) * 1000000 // st.total AS f_e6
      FROM st CROSS JOIN vocab v
      LEFT JOIN cnt ON cnt.source = st.source AND cnt.tok = v.tok
    ), mom AS (
      SELECT tok,
             CAST(COUNT(*) AS BIGINT) AS s,
             CAST(SUM(f_e6) AS BIGINT) AS sf,
             CAST(SUM(f_e6 * f_e6) AS BIGINT) AS sf2
      FROM f GROUP BY tok
    ), z AS (
      SELECT f.source, f.tok,
             (CAST(f.f_e6 AS DOUBLE) - CAST(m.sf AS DOUBLE) / m.s)
             / SQRT(GREATEST(
                 (CAST(m.sf2 AS DOUBLE) - CAST(m.sf AS DOUBLE) * m.sf / m.s)
                 / (m.s - 1), 1e-12)) AS z
      FROM f JOIN mom m USING (tok)
    )
    SELECT a.source AS src_a, b.source AS src_b,
           ROUND(list_reduce(list_prepend(0.0,
             list(ABS(a.z - b.z) ORDER BY a.tok)),
             (acc, x) -> acc + x) / 50.0, 6) AS burrows_delta
    FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def q459_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X389 — BURROWS' DELTA stylometric distance between sources
    (Burrows 2002; the standard authorship-attribution metric): z-score
    each source's relative frequency of the 50 most common corpus words
    against the across-source distribution, then Δ(a,b) = mean |z_a −
    z_b|. For a training pipeline this is DATASET FORENSICS — two feeds
    with near-zero Delta are stylistically one source (a resold crawl,
    a mirrored dump) even when q455's content-level dup audit is clean,
    and mixture weights treating them as independent double-count the
    style. Frequencies quantize to exact ppm integers (count·10⁶ DIV
    total) so the per-word across-source moments are exact int64; the
    one float reduction per pair (50 |z|-gaps) folds over a
    word-sorted array (the q448/q158 fold discipline). Top-50 vocab is
    deterministic ((count, tok) tiebreak).

    Scale: one token pass; everything after lives on |sources|×50
    relations. The vocabulary broadcast bounds the count join."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cn"))
        .orderBy(F.desc("cn"), "tok")
        .limit(50)
        .select("tok")
    )
    st = toks.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("total"))
    cnt = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    f = (
        st.crossJoin(F.broadcast(vocab))
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.expr("COALESCE(c, 0) * 1000000 DIV total").alias("f_e6"),
        )
    )
    mom = f.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum("f_e6").cast("long").alias("sf"),
        F.sum(F.col("f_e6") * F.col("f_e6")).cast("long").alias("sf2"),
    )
    z = f.join(F.broadcast(mom), "tok").select(
        "source",
        "tok",
        (
            (F.col("f_e6").cast("double") - F.col("sf").cast("double") / F.col("s"))
            / F.sqrt(
                F.greatest(
                    (
                        F.col("sf2").cast("double")
                        - F.col("sf").cast("double") * F.col("sf") / F.col("s")
                    )
                    / (F.col("s") - 1),
                    F.lit(1e-12),
                )
            )
        ).alias("z"),
    )
    a = z.select(
        F.col("source").alias("src_a"), "tok", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), "tok", F.col("z").alias("zb")
    )
    pairs = a.join(b, "tok").filter(F.col("src_a") < F.col("src_b"))
    gap = F.abs(F.col("za") - F.col("zb"))
    return pairs.groupBy("src_a", "src_b").agg(
        F.round(
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("tok", gap.alias("g")))
                ),
                F.lit(0.0),
                lambda acc, r: acc + r["g"],
            )
            / 50.0,
            6,
        ).alias("burrows_delta")
    )


def _maxcover_oracle(rounds: int = 5) -> str:
    ctes = [
        """grams AS MATERIALIZED (
      SELECT DISTINCT doc_id, md5(substr(lower(text), i, 8)) AS g
      FROM documents, UNNEST(range(1, length(lower(text)) - 6)) AS t(i)
      WHERE length(text) >= 8
    )""",
        """r1 AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM grams GROUP BY doc_id
    )""",
        "w1 AS (SELECT doc_id, cnt FROM r1 ORDER BY cnt DESC, doc_id LIMIT 1)",
        """c1 AS MATERIALIZED (
      SELECT DISTINCT g FROM grams JOIN w1 USING (doc_id)
    )""",
    ]
    for k in range(2, rounds + 1):
        sel = " UNION ALL ".join(f"SELECT doc_id FROM w{j}" for j in range(1, k))
        ctes.append(
            f"""r{k} AS (
      SELECT gr.doc_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM grams gr
      ANTI JOIN c{k - 1} c ON gr.g = c.g
      ANTI JOIN ({sel}) s ON gr.doc_id = s.doc_id
      GROUP BY gr.doc_id
    )"""
        )
        ctes.append(
            f"w{k} AS (SELECT doc_id, cnt FROM r{k} ORDER BY cnt DESC,"
            " doc_id LIMIT 1)"
        )
        ctes.append(
            f"""c{k} AS MATERIALIZED (
      SELECT g FROM c{k - 1}
      UNION
      SELECT g FROM grams JOIN w{k} USING (doc_id)
    )"""
        )
    finals = " UNION ALL ".join(
        f"SELECT {k} AS rank, w{k}.doc_id, w{k}.cnt AS new_grams,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM c{k}) AS total_covered"
        f" FROM w{k}"
        for k in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(rank AS BIGINT) AS rank, doc_id,
           CAST(new_grams AS BIGINT) AS new_grams, total_covered
    FROM ({finals})"""
    )


@register(
    "q463_greedy_coverage_selection",
    build_time_exec=(
        "5 unrolled greedy rounds checkpoint the covered-gram relation "
        "and the 1-row winner each round so the gram subtree executes "
        "once per round, not 2^rounds times"
    ),
    allow_non_equi=(
        "each round crossJoins the 1-row winner scalar onto the gram "
        "relation to split newly-covered grams - 1-row broadcast, "
        "never row-level"
    ),
    oracle=_maxcover_oracle(5),
)
def q463_greedy_coverage_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X393 — GREEDY COVERAGE-MAXIMIZING DATA SELECTION (facility
    location / max-cover; the submodular-selection shape behind
    diversity-targeted corpus curation): 5 unrolled greedy rounds each
    pick the document adding the most UNCOVERED distinct char-8-grams
    (md5'd, the q343 gram family), publishing (rank, doc_id, new_grams,
    total_covered) — the classic (1−1/e)-approximate solution to "pick
    k docs covering the most n-gram space", which is how a curation
    run seeds few-shot pools and dedup-aware eval probes (Lin &
    Bilmes 2011 for the submodular framing). Greedy ties break to the
    lowest doc_id on both engines (ORDER BY cnt DESC, doc_id ≡
    max(struct(cnt, −doc_id))); selected docs are excluded from later
    rounds; every round is one anti-join + count + 1-row argmax.

    Scale: the gram relation builds once (checkpointed); each round
    touches |uncovered grams| which shrinks monotonically; the winner
    is a 1-row broadcast. k is the only unrolled axis — for large k,
    switch to the lazier stochastic-greedy variant (same kernel)."""
    from noaa_ais_glue_lakehouse_spark.operators.checkpointing import (
        iteration_checkpointer,
    )

    _ckpt = iteration_checkpointer(spark)
    docs = load(spark, sf_dir, "documents")
    grams = _ckpt(
        docs.filter(F.length("text") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(lower(text)) - 7),"
                    " i -> md5(substring(lower(text), i, 8)))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    covered = None
    selected_rows = []
    out_rows = []
    for k in range(1, 6):
        rem = grams
        if covered is not None:
            rem = rem.join(covered, "g", "left_anti")
        for wdf in selected_rows:
            rem = rem.join(F.broadcast(wdf.select("doc_id")), "doc_id", "left_anti")
        counts = rem.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        winner = _ckpt(
            counts.agg(
                F.max(F.struct("cnt", (-F.col("doc_id")).alias("negid"))).alias("m")
            ).select(
                (-F.col("m.negid")).cast("long").alias("doc_id"),
                F.col("m.cnt").cast("long").alias("cnt"),
            )
        )
        selected_rows.append(winner)
        newly = grams.join(F.broadcast(winner.select("doc_id")), "doc_id").select("g")
        covered = _ckpt(
            newly if covered is None else covered.unionByName(newly).distinct()
        )
        tot = covered.agg(F.count(F.lit(1)).cast("long").alias("total_covered"))
        out_rows.append(
            winner.crossJoin(F.broadcast(tot)).select(
                F.lit(k).cast("long").alias("rank"),
                "doc_id",
                F.col("cnt").alias("new_grams"),
                "total_covered",
            )
        )
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "q468_split_distribution_shift",
    allow_non_equi=(
        "one 1-row arm-totals scalar crossJoin-attached onto the "
        "vocab-grain count relation"
    ),
    oracle=r"""
    WITH toks AS (
      SELECT CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 10 < 8
                  THEN 'train' ELSE 'val' END AS arm,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), cnt AS (
      SELECT tok,
             CAST(SUM(CASE WHEN arm = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS ct,
             CAST(SUM(CASE WHEN arm = 'val' THEN 1 ELSE 0 END) AS BIGINT)
               AS cv
      FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cv) AS BIGINT) AS nv,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM cnt
    ), terms AS (
      SELECT tok,
             CAST(ct AS DOUBLE) / nt AS p,
             CAST(cv AS DOUBLE) / nv AS q
      FROM cnt, tot
    ), qterm AS (
      SELECT tok,
             CAST(ROUND(CASE WHEN p > 0
                  THEN p * LOG2(p / ((p + q) / 2.0)) ELSE 0.0 END
                  * 1000000000) AS BIGINT) AS jp_e9,
             CAST(ROUND(CASE WHEN q > 0
                  THEN q * LOG2(q / ((p + q) / 2.0)) ELSE 0.0 END
                  * 1000000000) AS BIGINT) AS jq_e9
      FROM terms
    )
    SELECT (SELECT nt FROM tot) AS n_train_tokens,
           (SELECT nv FROM tot) AS n_val_tokens,
           (SELECT vocab FROM tot) AS vocab_size,
           ROUND((CAST(SUM(jp_e9) AS DOUBLE)
                  + CAST(SUM(jq_e9) AS DOUBLE)) / 2.0e9, 6) AS js_divergence
    FROM qterm
    """,
)
def q468_split_distribution_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X398 — TRAIN/VAL TOKEN-DISTRIBUTION SHIFT: Jensen–Shannon
    divergence between the token unigram distributions of the id-hash
    train/val split (the q105/q13-family 80/20 md5 split). A val set
    drawn i.i.d. should sit at JS ≈ 0; real pipelines drift when the
    split key correlates with source or time, and THIS number is the
    gate — an eval on a shifted val set mis-ranks checkpoints before a
    single model trains. Per-token JS terms quantize to nano-int
    BEFORE summation (the q434 ppm discipline, so the vocab-grain sum
    is order-free in both engines); counts and totals are exact
    integers throughout.

    Scale: one token pass to vocab grain, conditional sums (one
    shuffle), a 1-row reduce. Vocab-grain term rows never leave the
    JVM."""
    docs = load(spark, sf_dir, "documents")
    arm = F.when(
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 10"
        )
        < 8,
        "train",
    ).otherwise("val")
    toks = docs.select(
        arm.alias("arm"), F.explode(tokenize(F.col("text"))).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("arm") == "train", 1).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum(F.when(F.col("arm") == "val", 1).otherwise(0))
        .cast("long")
        .alias("cv"),
    )
    tot = cnt.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("cv").cast("long").alias("nv"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        (F.col("ct").cast("double") / F.col("nt")).alias("p"),
        (F.col("cv").cast("double") / F.col("nv")).alias("q"),
        "nt",
        "nv",
        "vocab",
    )
    m = (F.col("p") + F.col("q")) / 2.0
    qterm = terms.select(
        "nt",
        "nv",
        "vocab",
        F.round(
            F.when(F.col("p") > 0, F.col("p") * F.log2(F.col("p") / m)).otherwise(
                0.0
            )
            * 1000000000
        )
        .cast("long")
        .alias("jp_e9"),
        F.round(
            F.when(F.col("q") > 0, F.col("q") * F.log2(F.col("q") / m)).otherwise(
                0.0
            )
            * 1000000000
        )
        .cast("long")
        .alias("jq_e9"),
    )
    return qterm.groupBy("nt", "nv", "vocab").agg(
        F.round(
            (
                F.sum("jp_e9").cast("double")
                + F.sum("jq_e9").cast("double")
            )
            / 2.0e9,
            6,
        ).alias("js_divergence")
    ).select(
        F.col("nt").alias("n_train_tokens"),
        F.col("nv").alias("n_val_tokens"),
        F.col("vocab").alias("vocab_size"),
        "js_divergence",
    )


@register(
    "q482_feature_hashing_portable",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, UNNEST(tk) AS tok FROM toks)
      GROUP BY doc_id, tok
    ), hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('fh|', tok)), 1, 15))
                  AS BIGINT) % 64 AS bucket,
             CASE WHEN CAST(concat('0x', substr(md5(concat('fs|', tok)),
                                  1, 15)) AS BIGINT) % 2 = 1
                  THEN cnt ELSE -cnt END AS v
      FROM tf
    ), fv AS (
      SELECT doc_id, bucket, CAST(SUM(v) AS BIGINT) AS v
      FROM hashed GROUP BY doc_id, bucket
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
           CAST(SUM(ABS(v)) AS BIGINT) AS l1,
           CAST(SUM(v * v) AS BIGINT) AS l2_sq,
           CAST(SUM(bucket * v) AS BIGINT) AS checksum
    FROM fv GROUP BY doc_id
    """,
)
def q482_feature_hashing_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X412 — THE HASHING TRICK (Weinberger et al. 2009), portable:
    every document's bag-of-words projected into a fixed 64-bucket
    signed feature vector — bucket = md5(token) mod 64, sign from an
    independent md5 bit (the signed variant that makes collisions
    cancel in expectation, which is what keeps hashed features
    unbiased). This is the feature layer a large-scale linear/GBDT
    quality classifier trains on when the vocabulary is unbounded —
    fixed dimensionality, no vocab build, no OOV. Published per doc as
    exact int64 summaries (nnz, L1, L2², a bucket-weighted checksum)
    so the full vector transport is hash-gated without 64 columns.

    Scale: one (doc, token)-grain count, one (doc, bucket) rollup, one
    doc rollup — all map-side combinable; no vocabulary state at all
    (the entire point of hashing features at 100 TB)."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fh|"), F.col("tok"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 64
    )
    sign_bit = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fs|"), F.col("tok"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 2
    )
    hashed = tf.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(sign_bit == 1, F.col("cnt")).otherwise(-F.col("cnt")).alias(
            "v"
        ),
    )
    fv = hashed.groupBy("doc_id", "bucket").agg(
        F.sum("v").cast("long").alias("v")
    )
    return fv.groupBy("doc_id").agg(
        F.sum(F.when(F.col("v") != 0, 1).otherwise(0))
        .cast("long")
        .alias("nnz"),
        F.sum(F.abs(F.col("v"))).cast("long").alias("l1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("l2_sq"),
        F.sum(F.col("bucket") * F.col("v")).cast("long").alias("checksum"),
    )


@register(
    "q484_rouge_l_vs_source_exemplar",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ), refs AS (
      SELECT source, MIN(doc_id) AS ref_id FROM toks GROUP BY source
    ), pairs AS (
      SELECT t.doc_id, t.source, t.tk AS tb, r2.tk AS ta
      FROM toks t
      JOIN refs r ON r.source = t.source AND t.doc_id <> r.ref_id
      JOIN toks r2 ON r2.doc_id = r.ref_id
      WHERE len(t.tk) > 0 AND len(r2.tk) > 0
    ), cells AS (
      SELECT doc_id, source,
             CAST(LEAST(len(ta), 8) AS BIGINT) AS la,
             CAST(LEAST(len(tb), 8) AS BIGINT) AS lb,
"""
    + ",\n".join(
        f"             COALESCE(ta[{i}], concat('\\u241aa', {i})) AS a{i},\n"
        f"             COALESCE(tb[{i}], concat('\\u241ab', {i})) AS b{i}"
        for i in range(1, 9)
    )
    + """
      FROM pairs
    ), dp AS (
      SELECT doc_id, source, la, lb,
"""
    + ",\n".join(
        f"             {e} AS {a}" for a, e in _lcs8_alias_chain()
    )
    + """
      FROM cells
    )
    SELECT doc_id, source,
           CAST(l88 AS BIGINT) AS lcs_len, la, lb,
           CAST(2 * l88 * 1000000 // (la + lb) AS BIGINT)
             AS rouge_l_f_ppm
    FROM dp
    """,
)
def q484_rouge_l_vs_source_exemplar(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X414 — ROUGE-L of every document against its source's EXEMPLAR
    (min-id doc), on the first 8 tokens: the LCS-based similarity that
    summarization/boilerplate audits use — order-sensitive where
    n-gram Jaccard (q82) is not, so templated intros that reorder
    words score differently. The 8×8 LCS recurrence is UNROLLED into
    64 lateral column aliases (the q386 DTW move —
    _shared._lcs8_alias_chain emits the SAME text for both engines),
    missing positions padded with side-distinct sentinels so short
    docs never phantom-match; F1 = 2·LCS/(la+lb) published in exact
    ppm integers (DIV). The 8-token prefix cap is the fixed-shape
    price of full unrolling — variable-length ROUGE is where an
    applyInPandas form would take over (the q352/q386 adjudication).

    Scale: one broadcast of |sources| exemplar token rows into the doc
    scan, then a pure row-local 64-alias projection inside
    whole-stage codegen — scan-bound, zero extra shuffles."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        tokenize(F.col("text")).alias("tk"),
    )
    refs = toks.groupBy("source").agg(F.min("doc_id").alias("ref_id"))
    t2 = toks.select(
        F.col("doc_id").alias("rid"),
        F.col("source").alias("rsrc"),
        F.col("tk").alias("ta"),
    )
    ref_toks = t2.join(
        F.broadcast(refs.select("ref_id")), t2.rid == F.col("ref_id")
    ).select("rsrc", "ta")
    pairs = (
        toks.join(F.broadcast(refs), "source")
        .filter(F.col("doc_id") != F.col("ref_id"))
        .join(
            F.broadcast(ref_toks), F.col("source") == F.col("rsrc")
        )
        .filter((F.size("tk") > 0) & (F.size("ta") > 0))
        .select("doc_id", "source", F.col("tk").alias("tb"), "ta")
    )
    cells = pairs.select(
        "doc_id",
        "source",
        F.least(F.size("ta"), F.lit(8)).cast("long").alias("la"),
        F.least(F.size("tb"), F.lit(8)).cast("long").alias("lb"),
        *[
            c
            for i in range(1, 9)
            for c in (
                F.coalesce(
                    F.element_at("ta", i), F.concat(F.lit("␚a"), F.lit(str(i)))
                ).alias(f"a{i}"),
                F.coalesce(
                    F.element_at("tb", i), F.concat(F.lit("␚b"), F.lit(str(i)))
                ).alias(f"b{i}"),
            )
        ],
    )
    dp = cells
    for alias, expr in _lcs8_alias_chain():
        dp = dp.withColumn(alias, F.expr(expr))
    return dp.select(
        "doc_id",
        "source",
        F.col("l88").cast("long").alias("lcs_len"),
        "la",
        "lb",
        F.expr("CAST(2 * l88 * 1000000 DIV (la + lb) AS BIGINT)").alias(
            "rouge_l_f_ppm"
        ),
    )


@register(
    "q494_langid_confusion",
    oracle=f"""
    WITH base AS ({_langid_oracle()}),
    cells AS (
      SELECT lang AS declared, guess AS predicted,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY declared, predicted
    ), rows_ AS (
      SELECT declared, CAST(SUM(n) AS BIGINT) AS n_declared
      FROM cells GROUP BY declared
    )
    SELECT c.declared, c.predicted, c.n,
           CAST(c.n * 1000000 // r.n_declared AS BIGINT) AS row_ppm,
           CAST(CASE WHEN c.declared = c.predicted THEN 1 ELSE 0 END
                AS BIGINT) AS is_diagonal
    FROM cells c JOIN rows_ r USING (declared)
    ORDER BY c.declared, c.predicted
    """,
)
def q494_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X424 — LANGUAGE-ID CONFUSION MATRIX: the declared ``lang``
    column cross-tabulated against the marker-based langid prediction
    (q31's classifier) — the per-class evaluation a curation pipeline
    needs BEFORE trusting langid-driven filtering (q31 publishes
    predictions; this publishes WHERE they're wrong: which declared
    languages leak into 'und' or into each other, with per-declared
    row ppm so class imbalance can't hide a bad minority class).
    Prediction reuses the exact q31 tie rules (argmax with fixed
    precedence, 'und' on zero markers) so the matrix is consistent
    with the deployed classifier by construction.

    Scale: one classify-and-count pass at (declared, predicted) grain
    — ≤ 36 output cells regardless of corpus size."""
    from noaa_ais_glue_lakehouse_spark.functions.text import langid_guess

    docs = load(spark, sf_dir, "documents")
    cells = (
        docs.select(
            F.col("lang").alias("declared"),
            langid_guess(F.col("text")).alias("predicted"),
        )
        .groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rows_ = cells.groupBy("declared").agg(
        F.sum("n").cast("long").alias("n_declared")
    )
    return (
        cells.join(F.broadcast(rows_), "declared")
        .select(
            "declared",
            "predicted",
            "n",
            F.expr("CAST(n * 1000000 DIV n_declared AS BIGINT)").alias(
                "row_ppm"
            ),
            F.when(F.col("declared") == F.col("predicted"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_diagonal"),
        )
        .orderBy("declared", "predicted")
    )


@register(
    "q500_vocab_coverage_curve",
    allow_non_equi=(
        "1-row vocabulary-size / total-mass scalars crossJoin-attached "
        "onto the token rollup and the 10-row decile table - "
        "group-cardinality, never row-level"
    ),
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ), tf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT UNNEST(tk) AS tok FROM toks)
      GROUP BY tok
    ), ranked AS (
      SELECT tok, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk,
             COUNT(*) OVER () AS v
      FROM tf
    ), dec AS (
      SELECT CAST((rnk - 1) * 10 // v AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(c) AS BIGINT) AS token_mass
      FROM ranked GROUP BY 1
    ), tot AS (SELECT CAST(SUM(token_mass) AS BIGINT) AS total FROM dec)
    SELECT decile, n_types, token_mass,
           CAST(SUM(token_mass) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) * 1000000 // t.total AS BIGINT)
             AS cum_mass_ppm
    FROM dec CROSS JOIN tot t
    ORDER BY decile
    """,
)
def q500_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X430 — VOCABULARY COVERAGE CURVE (the Lorenz curve of token
    frequency): corpus vocabulary split into frequency-rank deciles,
    each publishing its type count, token mass, and CUMULATIVE corpus
    coverage in exact ppm — the vocab-sizing table behind every
    tokenizer decision (q240 BPE, q303 OOV): "the top 10% of types
    covers X% of tokens" is the number that sets vocab_size, and its
    complement is the long tail a subword tokenizer must absorb.
    Complements q? zipf's SLOPE fit with the exact cumulative masses
    the slope only approximates. Rank ties break deterministically by
    (count DESC, token); everything is int64 (counting, decile DIV,
    the windowed cumulative ppm).

    Scale: one token-grain count (map-side combinable), one
    vocab-grain rank window, a 10-row rollup."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wr = Window.orderBy(F.desc("c"), "tok")
    ranked = tf.select(
        "c",
        F.row_number().over(wr).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("v"),
    )
    dec = ranked.groupBy(
        F.expr("CAST((rnk - 1) * 10 DIV v AS BIGINT)").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("token_mass"),
    )
    tot = dec.agg(F.sum("token_mass").cast("long").alias("total"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        dec.join(F.broadcast(tot))
        .select(
            "decile",
            "n_types",
            "token_mass",
            F.expr(
                "CAST(SUM(token_mass) OVER (ORDER BY decile"
                " ROWS UNBOUNDED PRECEDING) * 1000000 DIV total"
                " AS BIGINT)"
            ).alias("cum_mass_ppm"),
        )
        .orderBy("decile")
    )
