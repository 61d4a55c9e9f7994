"""Keyword extraction and trained-classifier text analytics
(round-10 module): RAKE, TextRank, and a multinomial Naive Bayes
language classifier — the unsupervised-keyword and
learned-classifier layer a training-data curation pipeline runs after
the heuristic scores (q30 quality, q31 langid, q106 Gopher).

Portability discipline: every score that orders output is an EXACT
integer — RAKE word scores are integer-division micro-units, TextRank
is an all-integer staged power iteration (the q483 HITS technique),
and Naive Bayes log-likelihoods are micro-nat integers summed exactly
— so rankings can never split on a last-ulp float difference.

The reference repo has no text layer (its engine is AIS telemetry);
this module is beyond-reference surface mandated by the brief's
training-data-pipeline scope.
"""

from noaa_ais_glue_lakehouse_spark.functions.text import (
    DEFAULT_STOPWORDS,
    tokenize,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403

_STOP_SQL = ", ".join(f"'{w}'" for w in DEFAULT_STOPWORDS)

# Tokens with positions, one row per token occurrence (the q395 idiom).
_TOKS_CTE = r"""
    WITH toks AS (
      SELECT doc_id, source, lang, t.tok, CAST(t.pos AS BIGINT) AS pos
      FROM (
        SELECT doc_id, source, lang,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS tk
        FROM documents
      ), LATERAL (
        SELECT UNNEST(tk) AS tok,
               UNNEST(range(0, len(tk))) AS pos
      ) t
    )
"""


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        "lang",
        F.posexplode(tokenize(F.col("text"))).alias("pos", "tok"),
    ).select("doc_id", "source", "lang", F.col("pos").cast("long").alias("pos"), "tok")


# Stopword-delimited phrases of non-stop tokens (shared by RAKE and
# TextRank): phrase_id is the running count of stopwords seen so far.
_PH_CTE = (
    _TOKS_CTE
    + f"""
    , flagged AS (
      SELECT doc_id, source, tok, pos,
             CASE WHEN tok IN ({_STOP_SQL}) THEN 1 ELSE 0 END AS stop
      FROM toks
    ), ph AS (
      SELECT doc_id, source, tok, pos, phrase_id FROM (
        SELECT doc_id, source, tok, pos, stop,
               SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS phrase_id
        FROM flagged
      ) WHERE stop = 0
    )
"""
)


def _ph(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _toks(spark, sf_dir)
    stop = F.when(
        F.col("tok").isin(*DEFAULT_STOPWORDS), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = t.select("doc_id", "source", "tok", "pos", stop.alias("stop"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.select(
            "doc_id",
            "source",
            "tok",
            "pos",
            "stop",
            F.sum("stop").over(w).alias("phrase_id"),
        )
        .where(F.col("stop") == 0)
        .drop("stop")
    )


@register(
    "q521_rake_keywords",
    oracle=_PH_CTE
    + """
    , plen AS (
      SELECT doc_id, source, phrase_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             STRING_AGG(tok, ' ' ORDER BY pos) AS phrase
      FROM ph GROUP BY doc_id, source, phrase_id
    ), ws AS (
      SELECT p.source, p.tok,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(pl.n_words) AS BIGINT) AS degree
      FROM ph p
      JOIN plen pl ON pl.doc_id = p.doc_id AND pl.phrase_id = p.phrase_id
      GROUP BY p.source, p.tok
    ), scored AS (
      SELECT source, tok, freq, degree,
             (degree * 1000000) // freq AS score_e6
      FROM ws
    ), ps AS (
      SELECT p.source, p.doc_id, p.phrase_id, pl.phrase, pl.n_words,
             CAST(SUM(w.score_e6) AS BIGINT) AS score_e6
      FROM ph p
      JOIN scored w ON w.source = p.source AND w.tok = p.tok
      JOIN plen pl ON pl.doc_id = p.doc_id AND pl.phrase_id = p.phrase_id
      GROUP BY p.source, p.doc_id, p.phrase_id, pl.phrase, pl.n_words
    ), agg AS (
      SELECT source, phrase,
             CAST(MAX(n_words) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS occurrences,
             CAST(MAX(score_e6) AS BIGINT) AS score_e6
      FROM ps GROUP BY source, phrase
    )
    SELECT source, phrase, n_words, occurrences, score_e6,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY score_e6 DESC, occurrences DESC, phrase) AS rk
      FROM agg
    ) WHERE rk <= 5
    """,
)
def q521_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X449 — RAKE keyword extraction (Rose et al. 2010) per source:
    stopword-delimited candidate phrases, word scores deg(w)/freq(w)
    where deg counts co-occurring words (phrase length) over all
    phrases containing w, phrase score = Σ word scores, top-5 phrases
    per source.  The classic zero-training keyword extractor — what a
    curation pipeline runs to label what a source is ABOUT before
    mixture planning.

    Exactness: word scores are integer-division micro-units
    ((degree·1e6) // freq), so phrase scores are exact int64 sums and
    the per-source ranking can never split on float noise; ties break
    deterministically (score, occurrences, phrase text).  Phrase text
    itself is an ORDERED aggregation (sort_array(collect_list(struct))
    / STRING_AGG ORDER BY).

    Scale: token-grain explode, then everything is hash-keyed
    groupBys/joins on (doc, phrase) and (source, word) — linear, no
    pairwise stage; the final top-5 rides a per-source window over
    phrase-grain rows."""
    ph = _ph(spark, sf_dir)
    plen = ph.groupBy("doc_id", "source", "phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
    )
    ws = (
        ph.join(
            plen.select("doc_id", "phrase_id", "n_words"),
            ["doc_id", "phrase_id"],
        )
        .groupBy("source", "tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("n_words").cast("long").alias("degree"),
        )
        .select(
            "source",
            "tok",
            F.expr("(degree * 1000000) DIV freq").alias("score_e6"),
        )
    )
    ps = (
        ph.join(ws, ["source", "tok"])
        .groupBy("source", "doc_id", "phrase_id")
        .agg(F.sum("score_e6").cast("long").alias("score_e6"))
        .join(
            plen.select("doc_id", "phrase_id", "phrase", "n_words"),
            ["doc_id", "phrase_id"],
        )
        .select("source", "doc_id", "phrase_id", "phrase", "n_words",
                "score_e6")
    )
    agg = ps.groupBy("source", "phrase").agg(
        F.max("n_words").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("occurrences"),
        F.max("score_e6").cast("long").alias("score_e6"),
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("score_e6").desc(), F.col("occurrences").desc(), F.col("phrase")
    )
    return (
        agg.select(
            "source",
            "phrase",
            "n_words",
            "occurrences",
            "score_e6",
            F.row_number().over(wr).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 5)
    )


def _textrank_round_sql(r: int) -> str:
    return f"""
    , w{r} AS (
      SELECT e.b AS tok, CAST(SUM((v.v * e.w) // d.wdeg) AS BIGINT) AS wi
      FROM edges e
      JOIN v{r - 1} v ON v.tok = e.a
      JOIN wdeg d ON d.tok = e.a
      GROUP BY e.b
    ), v{r} AS (
      SELECT tok, CAST(150000 + (17 * wi) // 20 AS BIGINT) AS v FROM w{r}
    )"""


@register(
    "q522_textrank_keywords",
    oracle=_PH_CTE
    + """
    , seq AS (
      SELECT doc_id, tok, pos,
             LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
             LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS npos
      FROM ph
    ), adj AS (
      SELECT CASE WHEN tok < nxt THEN tok ELSE nxt END AS x,
             CASE WHEN tok < nxt THEN nxt ELSE tok END AS y
      FROM seq
      WHERE nxt IS NOT NULL AND npos = pos + 1 AND tok <> nxt
    ), und AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS w FROM adj GROUP BY x, y
    ), edges AS (
      SELECT x AS a, y AS b, w FROM und
      UNION ALL SELECT y, x, w FROM und
    ), wdeg AS (
      SELECT a AS tok, CAST(SUM(w) AS BIGINT) AS wdeg
      FROM edges GROUP BY a
    ), v0 AS (
      SELECT tok, CAST(1000000 AS BIGINT) AS v FROM wdeg
    )"""
    + "".join(_textrank_round_sql(r) for r in (1, 2, 3))
    + """
    SELECT v.tok, d.wdeg, v.v AS score_e6, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT tok, v, ROW_NUMBER() OVER (ORDER BY v DESC, tok) AS rk
      FROM v3
    ) v JOIN wdeg d ON d.tok = v.tok
    WHERE rk <= 20
    """,
)
def q522_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X450 — TEXTRANK keyword scores (Mihalcea & Tarau 2004): PageRank
    (damping 0.85, 3 rounds) on the undirected word co-occurrence
    graph of adjacent non-stop tokens, top-20 words.  The graph-based
    complement to RAKE (q521): a word matters because its NEIGHBORS
    matter, not because its own phrases are long.

    Exactness: the all-integer staged power iteration of q483/q179 —
    scores start at 1e6, each round's flow is the integer division
    (v·w) // wdeg summed exactly, and damping is the exact rational
    150000 + (17·wi) // 20 (0.85 = 17/20).  Deterministic by
    construction; no renormalization scalar needed because damping
    keeps magnitudes bounded (v ≤ 1e6 invariant: flows sum to ≤
    Σ v_j ≤ 1e6·deg share).

    Scale: edges come from one LEAD window per doc partition and
    aggregate to (word, word) grain — vocabulary-bounded, exactly the
    pattern that keeps q179's event-type PageRank constant-size as the
    corpus grows.  Rounds are three key-joins on the edge list."""
    ph = _ph(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    seq = ph.select(
        "doc_id",
        "tok",
        "pos",
        F.lead("tok").over(w).alias("nxt"),
        F.lead("pos").over(w).alias("npos"),
    )
    adj = seq.where(
        "nxt IS NOT NULL AND npos = pos + 1 AND tok <> nxt"
    ).select(
        F.expr("CASE WHEN tok < nxt THEN tok ELSE nxt END").alias("x"),
        F.expr("CASE WHEN tok < nxt THEN nxt ELSE tok END").alias("y"),
    )
    und = adj.groupBy("x", "y").agg(F.count(F.lit(1)).cast("long").alias("w"))
    edges = und.select(
        F.col("x").alias("a"), F.col("y").alias("b"), "w"
    ).unionByName(
        und.select(F.col("y").alias("a"), F.col("x").alias("b"), "w")
    )
    wdeg = edges.groupBy(F.col("a").alias("tok")).agg(
        F.sum("w").cast("long").alias("wdeg")
    )
    v = wdeg.select("tok", F.lit(1000000).cast("long").alias("v"))
    for _ in range(3):
        flow = (
            edges.join(v, edges["a"] == v["tok"])
            .join(wdeg.withColumnRenamed("tok", "dtok"),
                  F.col("a") == F.col("dtok"))
            .select(
                F.col("b"),
                F.expr("(v * w) DIV wdeg").alias("f"),
            )
        )
        wi = flow.groupBy(F.col("b").alias("tok")).agg(
            F.sum("f").cast("long").alias("wi")
        )
        v = wi.select(
            "tok", F.expr("CAST(150000 + (17 * wi) DIV 20 AS BIGINT)").alias("v")
        )
    ranked = v.select(
        "tok",
        "v",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), F.col("tok")))
        .cast("long")
        .alias("rk"),
    ).where(F.col("rk") <= 20)
    return ranked.join(wdeg, "tok").select(
        "tok", "wdeg", F.col("v").alias("score_e6"), "rk"
    )


@register(
    "q523_naive_bayes_langid",
    allow_non_equi=(
        "the <=|langs| (5-row) trained-class dimension cross-joined "
        "onto test-document token rows for per-class scoring — "
        "class-cardinality, never row x row"
    ),
    oracle=_TOKS_CTE
    + """
    , tr AS (
      SELECT lang, tok FROM toks WHERE doc_id % 2 = 0
    ), cl AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM tr GROUP BY lang
    ), vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM tr
    ), wc AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tr
      GROUP BY lang, tok
    ), pri AS (
      SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
      FROM toks WHERE doc_id % 2 = 0 GROUP BY lang
    ), pr2 AS (
      SELECT lang, nd, CAST(SUM(nd) OVER () AS BIGINT) AS ndt FROM pri
    ), te AS (
      SELECT doc_id, lang AS true_lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE doc_id % 2 = 1 GROUP BY doc_id, lang, tok
    ), sc AS (
      SELECT t.doc_id, t.true_lang, c.lang AS cand, t.tok, t.cnt,
             CAST(FLOOR(LN(CAST(COALESCE(w.c, 0) + 1 AS DOUBLE)
                           / (c.n_l + vb.v)) * 1000000) AS BIGINT) AS s_micro
      FROM te t
      CROSS JOIN cl c
      CROSS JOIN vocab vb
      LEFT JOIN wc w ON w.lang = c.lang AND w.tok = t.tok
    ), ll AS (
      SELECT s.doc_id, s.true_lang, s.cand,
             CAST(SUM(s.cnt * s.s_micro) AS BIGINT)
               + CAST(MAX(FLOOR(LN(CAST(p.nd AS DOUBLE) / p.ndt) * 1000000))
                      AS BIGINT) AS ll_micro
      FROM sc s JOIN pr2 p ON p.lang = s.cand
      GROUP BY s.doc_id, s.true_lang, s.cand
    ), pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY doc_id
                 ORDER BY ll_micro DESC, cand) AS rk
        FROM ll
      ) WHERE rk = 1
    )
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY true_lang, pred_lang
    """,
)
def q523_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X451 — TRAINED multinomial NAIVE BAYES language classifier:
    train on even doc_ids (add-1-smoothed per-(lang, token) counts +
    log priors), score odd doc_ids, and publish the (true, predicted)
    confusion matrix.  The learned counterpart to the fixed-marker
    heuristic q31/q494 — this is the fastText-style "train a langid /
    quality classifier on a labeled slice, apply to the corpus"
    pipeline stage, in pure DataFrame algebra.

    Exactness: per-(token, class) log-probabilities are quantized ONCE
    to micro-nat integers (FLOOR(LN(·)·1e6) — a deterministic double
    closed-form of exact counts), so per-doc log-likelihoods are exact
    int64 dot products and the argmax can never split on accumulation
    order; ties break lexicographically.

    Scale: training is one (lang, token) aggregation; scoring joins
    test token-grain rows to the 5-row class dimension (broadcast) and
    the (lang, token) table (key join) — linear in corpus tokens, the
    same shape fastText scoring has on a cluster."""
    t = _toks(spark, sf_dir)
    tr = t.where("doc_id % 2 = 0")
    cl = tr.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    vocab = tr.agg(F.countDistinct("tok").cast("long").alias("v"))
    wc = tr.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pri = (
        tr.groupBy("lang")
        .agg(F.countDistinct("doc_id").cast("long").alias("nd"))
        .select(
            "lang",
            "nd",
            F.sum("nd").over(Window.partitionBy()).cast("long").alias("ndt"),
        )
    )
    te = (
        t.where("doc_id % 2 = 1")
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    sc = (
        te.crossJoin(F.broadcast(cl.withColumnRenamed("lang", "cand")))
        .crossJoin(F.broadcast(vocab))
        .join(
            wc.withColumnRenamed("lang", "wlang").withColumnRenamed(
                "tok", "wtok"
            ),
            (F.col("wlang") == F.col("cand")) & (F.col("wtok") == F.col("tok")),
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            "cand",
            "cnt",
            F.expr(
                "CAST(FLOOR(LN(CAST(COALESCE(c, 0) + 1 AS DOUBLE)"
                " / (n_l + v)) * 1000000) AS BIGINT)"
            ).alias("s_micro"),
        )
    )
    ll = (
        sc.join(
            F.broadcast(
                pri.select(
                    F.col("lang").alias("cand"),
                    F.expr(
                        "CAST(FLOOR(LN(CAST(nd AS DOUBLE) / ndt) * 1000000)"
                        " AS BIGINT)"
                    ).alias("prior_micro"),
                )
            ),
            "cand",
        )
        .groupBy("doc_id", "true_lang", "cand")
        .agg(
            (
                F.sum(F.expr("cnt * s_micro")).cast("long")
                + F.max("prior_micro").cast("long")
            ).alias("ll_micro")
        )
    )
    pred = (
        ll.select(
            "doc_id",
            "true_lang",
            F.col("cand").alias("pred_lang"),
            F.row_number()
            .over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("ll_micro").desc(), F.col("cand")
                )
            )
            .alias("rk"),
        )
        .where(F.col("rk") == 1)
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@register(
    "q540_chao1_ace_richness",
    oracle=_TOKS_CTE
    + """
    , wc AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(SUM(CASE WHEN c <= 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_rare,
             CAST(SUM(CASE WHEN c <= 10 THEN c ELSE 0 END) AS BIGINT)
               AS n_rare,
             CAST(SUM(CASE WHEN c <= 10 THEN c * (c - 1) ELSE 0 END)
                  AS BIGINT) AS rare_ii
      FROM wc
    )
    SELECT v, n, f1, f2, v_rare, n_rare,
           v + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)) AS chao1,
           CASE WHEN n_rare > 1 AND f1 < n_rare THEN
             (v - v_rare)
               + v_rare / (1.0 - CAST(f1 AS DOUBLE) / n_rare)
               + (f1 / (1.0 - CAST(f1 AS DOUBLE) / n_rare))
                 * GREATEST(
                     CAST(v_rare AS DOUBLE)
                       / (1.0 - CAST(f1 AS DOUBLE) / n_rare)
                       * rare_ii
                       / (CAST(n_rare AS DOUBLE) * (n_rare - 1)) - 1.0,
                     0.0)
           END AS ace
    FROM m
    """,
)
def q540_chao1_ace_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X467 — CHAO1 and ACE vocabulary-richness estimators: how many
    distinct tokens does the corpus REALLY have, including the ones
    not yet observed?  Chao1 extrapolates from singletons/doubletons
    (bias-corrected form); ACE uses the full rare-token (count ≤ 10)
    abundance structure with its coverage estimate and γ² dispersion.
    The capture-recapture view of vocabulary that complements q377's
    empirical growth curve and q427's Good-Turing unseen-mass estimate
    — a data-buyer's question ("is this corpus's vocabulary saturated?")
    answered from one frequency table.

    Exactness: every input (V, N, f1, f2, rare-class moments including
    Σc(c−1)) is an exact int64 aggregate of the (token, count) table;
    both estimators are single closed-form doubles, with ACE's γ²
    clamped at 0 per the standard definition.

    Scale: one (token) hash aggregation — the q91 vocabulary shape —
    then a 1-row fold."""
    t = _toks(spark, sf_dir)
    wc = t.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = wc.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
        F.sum(F.when(F.col("c") <= 10, 1).otherwise(0))
        .cast("long")
        .alias("v_rare"),
        F.sum(F.when(F.col("c") <= 10, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_rare"),
        F.sum(F.when(F.col("c") <= 10, F.expr("c * (c - 1)")).otherwise(0))
        .cast("long")
        .alias("rare_ii"),
    )
    return m.select(
        "v",
        "n",
        "f1",
        "f2",
        "v_rare",
        "n_rare",
        F.expr(
            "v + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1))"
        ).alias("chao1"),
        F.expr(
            "CASE WHEN n_rare > 1 AND f1 < n_rare THEN"
            " (v - v_rare)"
            " + v_rare / (1.0 - CAST(f1 AS DOUBLE) / n_rare)"
            " + (f1 / (1.0 - CAST(f1 AS DOUBLE) / n_rare))"
            " * GREATEST("
            " CAST(v_rare AS DOUBLE) / (1.0 - CAST(f1 AS DOUBLE) / n_rare)"
            " * rare_ii / (CAST(n_rare AS DOUBLE) * (n_rare - 1)) - 1.0,"
            " 0.0)"
            " END"
        ).alias("ace"),
    )
