"""Graph analytics over the dup/event graphs.

Moved verbatim from the single-file catalog in the round-8 package
split; see _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403


@register(
    "q179_event_type_pagerank",
    build_time_exec="pagerank counts |V| once at plan build to seed the uniform vector",
    oracle="""
    WITH lg AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), e AS (
      SELECT prev_type AS src, event_type AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lg WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), t AS (
      SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM e
    ), nodes AS (
      SELECT src AS node FROM t UNION SELECT dst FROM t
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (
      SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
    ),
    pr1 AS (
      SELECT v.node, 0.15 / (SELECT n FROM nn)
             + 0.85 * COALESCE((SELECT SUM(r.rank * t.p) FROM pr0 r
                                JOIN t ON t.src = r.node
                                WHERE t.dst = v.node), 0.0) AS rank
      FROM nodes v
    ),
    pr2 AS (
      SELECT v.node, 0.15 / (SELECT n FROM nn)
             + 0.85 * COALESCE((SELECT SUM(r.rank * t.p) FROM pr1 r
                                JOIN t ON t.src = r.node
                                WHERE t.dst = v.node), 0.0) AS rank
      FROM nodes v
    ),
    pr3 AS (
      SELECT v.node, 0.15 / (SELECT n FROM nn)
             + 0.85 * COALESCE((SELECT SUM(r.rank * t.p) FROM pr2 r
                                JOIN t ON t.src = r.node
                                WHERE t.dst = v.node), 0.0) AS rank
      FROM nodes v
    )
    SELECT node AS event_type, ROUND(rank, 6) AS pagerank FROM pr3
    """,
)
def q179_event_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X106 — weighted PageRank over the event-type transition graph
    (the Markov edges of q97), 3 fixed iterations, d=0.85. On web-crawl
    corpora the same operator ranks domain authority for crawl-frontier
    and quality filtering; the graph here is tiny but the operator is
    the generic DataFrame-join iteration (two keyed shuffles per round,
    no driver state — see operators/graph.py). The oracle unrolls the
    identical recurrence as chained CTEs (DuckDB's recursive CTEs don't
    allow the aggregate in the recursive term).
    """
    from noaa_ais_glue_lakehouse_spark.operators.graph import pagerank

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(edges, "src", "dst", "w", iterations=3, damping=0.85)
    return ranks.select(
        F.col("node").alias("event_type"),
        F.round("rank", 6).alias("pagerank"),
    )



@register(
    "q214_triangle_count",
    allow_non_equi="deliberate 1-row x 1-row cross join: the edge-count scalar attached to the 1-row triangle-count aggregate",
    oracle="""
    WITH pairs AS (
      SELECT doc_id_a AS a, doc_id_b AS b FROM (
        SELECT f.doc_id AS doc_id_a, g.doc_id AS doc_id_b
        FROM (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x <> '')[1:8], ' ')) AS f
          FROM documents
        ) f
        JOIN (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x <> '')[1:8], ' ')) AS f
          FROM documents
        ) g ON f.f = g.f AND f.doc_id < g.doc_id
      )
    ),
    deg AS (
      SELECT v, COUNT(*) AS d FROM (
        SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY 1
    ),
    oriented AS (
      SELECT CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.a ELSE p.b END AS lo,
             CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.b ELSE p.a END AS hi
      FROM pairs p
      JOIN deg da ON da.v = p.a
      JOIN deg db ON db.v = p.b
    ),
    wedges AS (
      SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM oriented e1 JOIN oriented e2
        ON e1.lo = e2.lo AND e1.hi < e2.hi
    )
    SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM wedges w
    JOIN oriented e3
      ON (e3.lo = w.y AND e3.hi = w.z) OR (e3.lo = w.z AND e3.hi = w.y)
    """,
)
def q214_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X141 — distributed triangle counting on the duplicate graph (the
    clustering-coefficient numerator: high triangle density means dup
    CLUSTERS, not chains — evidence the near-dup threshold is finding
    real families rather than transitive noise). Edges are the
    deterministic document-head fingerprint collisions (q194's
    fingerprint).

    The classic degree-oriented algorithm: orient each edge from its
    lower-(degree, id) endpoint, enumerate wedges by joining oriented
    edges on their source — each wedge's apex is responsible only for
    its O(sqrt(|E|))-bounded out-neighborhood, which is what kills the
    quadratic hub blowup a naive neighbor join has — then close wedges
    against the oriented edge set. Every step is a keyed equi-join.
    """
    # shared edge construction with the q235-q237 graph family (defined
    # below; resolved at call time)
    pairs = _dup_edges(spark, sf_dir)
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    key_a = F.struct(F.col("da").alias("d"), F.col("a").alias("v"))
    key_b = F.struct(F.col("db").alias("d"), F.col("b").alias("v"))
    oriented = (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            F.when(key_a < key_b, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(key_a < key_b, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    e1 = oriented.select(F.col("lo"), F.col("hi").alias("y"))
    e2 = oriented.select(F.col("lo"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "lo").filter(F.col("y") < F.col("z"))
    # wedges enforce y < z by doc_id, so one id-normalized projection of
    # the edge set (|E| rows) closes them — unioning both orientations
    # would double the join's build volume for no semantic difference
    closing = oriented.select(
        F.least("lo", "hi").alias("y"), F.greatest("lo", "hi").alias("z")
    )
    tris = wedges.join(closing, ["y", "z"])
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tris.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"), "n_triangles"
        )
    )



@register("q230_spectral_features")  # rows-only: FFT floats are
# library/platform-specific; known-waveform values pinned in pytest
def q230_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X157 — multimodal frequency-domain path: per-frame spectral
    centroid + octave-band energy split over PCM16 payloads (document
    bytes stand in, as in q201), REAL numpy.fft math inside
    Arrow-batched mapInPandas. Complements q201's time-domain RMS/ZCR;
    together they are the standard pre-codec audio quality screen.
    """
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        extract_spectral_features,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = extract_spectral_features(docs, "doc_id", "payload", frame_samples=64)
    return out.select(
        F.col("id").alias("doc_id"),
        "frame_idx",
        F.round("centroid", 6).alias("centroid"),
        F.round("band_0", 6).alias("band_0"),
        F.round("band_1", 6).alias("band_1"),
        F.round("band_2", 6).alias("band_2"),
        F.round("band_3", 6).alias("band_3"),
    )



@register(
    "q235_label_propagation",
    oracle=_DUP_EDGES_CTE
    + """
    , nodes AS (SELECT DISTINCT src AS v FROM sym),
    lab1 AS (SELECT v, v AS lab FROM nodes),
    """
    + _lpa_round_sql(1)
    + ","
    + _lpa_round_sql(2)
    + ","
    + _lpa_round_sql(3)
    + """
    SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS size
    FROM lab4 GROUP BY lab
    """,
)
def q235_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162 — community detection by label propagation (Raghavan et al.),
    3 synchronous rounds with a DETERMINISTIC update (most frequent
    neighbor label, tiebreak count desc then label asc — vanilla LPA's
    random tie flip makes results unreproducible, which is useless for
    a data-dedup audit). Complements connected components (q62): LPA
    splits bridge-connected families that CC would glue together.

    Plan shape: each round is (edge join labels) -> per-node mode via a
    count aggregation + per-node top-1 window — all hash-partitioned on
    the node key, no driver-side iteration state (3 rounds compose
    lazily into one plan). Isolated nodes keep their label via the left
    join.
    """
    edges = _dup_edges(spark, sf_dir)
    sym = _sym_edges(edges)
    nodes = sym.select(F.col("src").alias("v")).distinct()
    lab = nodes.select("v", F.col("v").alias("lab"))
    for _ in range(3):
        nl = (
            sym.join(lab.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("v").orderBy(F.col("c").desc(), "lab")
        pick = (
            nl.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", F.col("lab").alias("new_lab"))
        )
        lab = lab.join(pick, "v", "left").select(
            "v", F.coalesce("new_lab", "lab").alias("lab")
        )
    return lab.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )



@register(
    "q236_kcore_decomposition",
    allow_non_equi="deliberate 1-row x 1-row cross join: node-count x edge-count report",
    oracle=_DUP_EDGES_CTE
    + """
    , sym1 AS (SELECT src, dst FROM sym),
    """
    + _kcore_round_sql(1)
    + ","
    + _kcore_round_sql(2)
    + ","
    + _kcore_round_sql(3)
    + """
    SELECT CAST((SELECT COUNT(DISTINCT src) FROM sym4) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM sym4) / 2 AS BIGINT) AS n_edges
    """,
)
def q236_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X163 — k-core peeling (3 rounds toward the 2-core): repeatedly
    drop nodes with degree < 2 and re-count. The dup-graph's 2-core is
    the set of documents in genuinely DENSE duplication structures —
    pendant one-off matches (the usual false positives of head
    fingerprints) peel away. Three fixed rounds compose lazily into one
    plan; each round is a degree aggregation + two semi-shaped joins on
    the node key.
    """
    sym = _sym_edges(_dup_edges(spark, sf_dir))
    for _ in range(3):
        deg = sym.groupBy(F.col("src").alias("v")).agg(
            F.count(F.lit(1)).alias("d")
        )
        keep = deg.filter(F.col("d") >= 2).select("v")
        sym = (
            sym.join(keep.withColumnRenamed("v", "src"), "src")
            .join(keep.withColumnRenamed("v", "dst"), "dst")
            .select("src", "dst")
        )
    n_nodes = sym.select("src").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    n_edges = sym.agg((F.count(F.lit(1)) / 2).cast("long").alias("n_edges"))
    return n_nodes.crossJoin(F.broadcast(n_edges))



@register(
    "q237_degree_assortativity",
    oracle=_DUP_EDGES_CTE
    + """
    , deg AS (SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY src),
    ep AS (
      SELECT da.d AS x, db.d AS y
      FROM sym s JOIN deg da ON da.v = s.src JOIN deg db ON db.v = s.dst
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM ep
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS assortativity
    FROM m
    """,
)
def q237_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X164 — degree assortativity of the dup graph: Pearson correlation
    of endpoint degrees over all directed edge instances (the standard
    Newman definition; using both orientations makes it symmetric).
    Positive = dup families are degree-stratified hubs-with-hubs;
    negative = star-shaped boilerplate centers. One number that
    distinguishes template explosions from mutual near-dup clusters.

    Plan shape: degree aggregation, two broadcast-able joins back onto
    the edge list, one exact-integer moment aggregation — the same
    closed-form Pearson machinery as q221/q234.
    """
    sym = _sym_edges(_dup_edges(spark, sf_dir))
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    ep = (
        sym.join(
            deg.select(F.col("v").alias("src"), F.col("d").alias("x")), "src"
        )
        .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("y")), "dst")
        .select("x", "y")
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    return ep.agg(
        (n / 2).cast("long").alias("n_edges"),
        F.round(
            (n * sxy - sx * sy).cast("double")
            / F.sqrt(
                (n * sxx - sx * sx).cast("double")
                * (n * syy - sy * sy).cast("double")
            ),
            6,
        ).alias("assortativity"),
    )



@register(
    "q288_adamic_adar_linkpred",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    deg AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS d FROM ut GROUP BY user_id
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_common_users,
           CAST(SUM(CAST(ROUND(1000000.0 / LN(CAST(g.d AS DOUBLE))) AS BIGINT))
                AS BIGINT) AS aa_score_micro
    FROM ut a
    JOIN ut b ON b.user_id = a.user_id AND a.event_type < b.event_type
    JOIN deg g ON g.user_id = a.user_id
    WHERE g.d >= 2
    GROUP BY 1, 2
    """,
)
def q288_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the user/event-type bipartite
    graph: score(t1,t2) = Σ over common users of 1/ln(user degree) —
    rare shared neighbors count more than promiscuous ones. Per-term
    scores are rounded to integer micro-units BEFORE summation so the
    float total is order-independent under the exact hash gate. The
    self-join explodes per-user type pairs — bounded by |types|² per
    user (types is a small domain), the standard wedge-enumeration
    shape; one shuffle on user_id, one on the pair."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    deg = ut.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
    )
    term = F.round(F.lit(1_000_000.0) / F.log(F.col("d").cast("double"))).cast("long")
    return (
        pairs.join(deg.filter(F.col("d") >= 2), "user_id")
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common_users"),
            F.sum(term).cast("long").alias("aa_score_micro"),
        )
    )



@register(
    "q415_local_clustering",
    oracle="""
    WITH pairs AS (
      SELECT doc_id_a AS a, doc_id_b AS b FROM (
        SELECT f.doc_id AS doc_id_a, g.doc_id AS doc_id_b
        FROM (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x <> '')[1:8], ' ')) AS f
          FROM documents
        ) f
        JOIN (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x <> '')[1:8], ' ')) AS f
          FROM documents
        ) g ON f.f = g.f AND f.doc_id < g.doc_id
      )
    ),
    deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY 1
    ),
    oriented AS (
      SELECT CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.a ELSE p.b END AS lo,
             CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.b ELSE p.a END AS hi
      FROM pairs p
      JOIN deg da ON da.v = p.a
      JOIN deg db ON db.v = p.b
    ),
    wedges AS (
      SELECT e1.lo AS apex, e1.hi AS y, e2.hi AS z
      FROM oriented e1 JOIN oriented e2
        ON e1.lo = e2.lo AND e1.hi < e2.hi
    ),
    tris AS (
      SELECT w.apex, w.y, w.z
      FROM wedges w
      JOIN (SELECT LEAST(lo, hi) AS y, GREATEST(lo, hi) AS z
            FROM oriented) c
        ON c.y = w.y AND c.z = w.z
    ),
    per_v AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
        SELECT apex AS v FROM tris
        UNION ALL SELECT y FROM tris
        UNION ALL SELECT z FROM tris
      ) GROUP BY 1
    )
    SELECT deg.v AS doc_id, deg.d AS degree,
           CAST(COALESCE(per_v.t, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.d >= 2
                THEN ROUND(2.0 * COALESCE(per_v.t, 0)
                           / (CAST(deg.d AS DOUBLE) * (deg.d - 1)), 6)
                ELSE 0.0 END AS lcc
    FROM deg LEFT JOIN per_v ON per_v.v = deg.v
    """,
)
def q415_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X345 — LOCAL CLUSTERING COEFFICIENT per node on the dup graph:
    lcc(v) = 2·t(v) / (d(v)·(d(v)−1)), the per-node companion of q214's
    global triangle count (reference: q214's degree-oriented wedge
    enumeration, every step a keyed equi-join). A near-dup node with
    high degree but lcc≈0 is a HUB stitching unrelated documents
    (transitive-noise evidence — exactly what a dedup threshold audit
    looks for), while lcc≈1 marks genuine duplicate cliques; the
    LPA/k-core screens (q235/q236) rank communities, this ranks each
    node's neighborhood closure. Triangles are enumerated once via the
    same degree-oriented orientation (apex responsible for its
    O(sqrt|E|) out-neighborhood) and credited to all three vertices by
    an explode + count — integer arithmetic end to end, the only float
    is the final published ratio.

    Scale: identical join topology to q214 (measured decade exponent
    0.70 family) plus one |triangles|x3 explode and a node-grain
    aggregate; no new shuffle shape."""
    pairs = _dup_edges(spark, sf_dir)
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    key_a = F.struct(F.col("da").alias("d"), F.col("a").alias("v"))
    key_b = F.struct(F.col("db").alias("d"), F.col("b").alias("v"))
    oriented = (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            F.when(key_a < key_b, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(key_a < key_b, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    e1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("y"))
    e2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "apex").filter(F.col("y") < F.col("z"))
    closing = oriented.select(
        F.least("lo", "hi").alias("y"), F.greatest("lo", "hi").alias("z")
    )
    tris = wedges.join(closing, ["y", "z"])
    per_v = (
        tris.select(F.col("apex").alias("v"))
        .unionAll(tris.select(F.col("y").alias("v")))
        .unionAll(tris.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    return deg.join(per_v, "v", "left").select(
        F.col("v").alias("doc_id"),
        F.col("d").alias("degree"),
        F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
        F.when(
            F.col("d") >= 2,
            F.round(
                2.0
                * F.coalesce("t", F.lit(0))
                / (F.col("d").cast("double") * (F.col("d") - 1)),
                6,
            ),
        )
        .otherwise(0.0)
        .alias("lcc"),
    )



@register(
    "q441_spectral_radius",
    allow_non_equi=(
        "each normalization step attaches the 1-row per-round max onto "
        "the node-grain vector; the meta row crossJoins the 5-row "
        "output"
    ),
    build_time_exec=(
        "the 10 power-iteration rounds localCheckpoint the node-grain "
        "vector each round so the fingerprint-pair subtree executes "
        "once, not 2^rounds times"
    ),
    oracle=_spectral_oracle(),
)
def q441_spectral_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X371 — SPECTRAL RADIUS + EIGENVECTOR CENTRALITY of the dup graph
    by sup-norm power iteration (von Mises iteration; λ₁ of the
    adjacency matrix): 10 rounds of Av with max-normalization, λ̂ =
    max(Av)/max(v) at the fixed point. λ₁ is the graph-level dup-
    severity scalar the per-node screens don't give — it upper-bounds
    mean degree, grows with clique size (a k-clique forces λ₁ ≥ k−1),
    and is THE threshold parameter of epidemic/cascade models, so
    "how fast would contamination spread over near-dup links" (q397's
    BFS asks per-seed; this is the graph constant). Eigencentrality's
    top-5 ranks the most structurally-embedded documents — hubs the
    degree count (q129) over-ranks when their neighbors are leaves.
    The vector lives in micro-unit integers with DIV-by-max
    normalization each round, so every iterate is engine-exact in any
    aggregation order.

    Scale: edge-grain join + node-grain aggregate per round (the q179
    pagerank shape) on a checkpointed vector; 10 rounds multiply plan
    stages, never data width. Checkpoint mode is conf-driven
    (operators/checkpointing.py): set ``spark_graft.checkpoint_dir``
    for reliable ``checkpoint()`` on a real cluster (localCheckpoint
    state dies with a lost executor)."""
    from noaa_ais_glue_lakehouse_spark.operators.checkpointing import (
        iteration_checkpointer,
    )

    _ckpt = iteration_checkpointer(spark)
    pairs = _dup_edges(spark, sf_dir)
    edges = _ckpt(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    )
    n_edges = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    v = _ckpt(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(1000000).cast("long").alias("v_e6"))
    )
    n_nodes = v.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    mx_col = None
    for _ in range(10):
        av = (
            edges.join(
                v.select(F.col("node").alias("dst"), "v_e6"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("v_e6").cast("long").alias("av"))
            .select(F.col("src").alias("node"), "av")
        )
        mx = av.agg(F.max("av").alias("mx"))
        v = _ckpt(
            av.crossJoin(F.broadcast(mx)).select(
                "node",
                F.expr("CAST((av * 1000000) DIV mx AS BIGINT)").alias("v_e6"),
                "mx",
            )
        )
    ranked = v.select(
        "node",
        "v_e6",
        "mx",
        F.row_number().over(Window.orderBy(F.desc("v_e6"), "node")).alias("rnk"),
    ).filter(F.col("rnk") <= 5)
    return (
        ranked.crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("rnk").cast("long").alias("rank"),
            F.col("node").alias("doc_id"),
            F.round(F.col("v_e6").cast("double") / 1e6, 6).alias("centrality"),
            F.round(F.col("mx").cast("double") / 1e6, 6).alias(
                "spectral_radius"
            ),
            "n_nodes",
            "n_edges",
        )
    )


