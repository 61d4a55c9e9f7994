"""Training-data assembly operators: deterministic sampling, split
assignment, and token-budget sequence packing.

These are the steps between "cleaned corpus" and "batches on the trainer":
subsample/rebalance classes, carve held-out splits, and pack documents
into fixed token windows. All three are deterministic (hash/arithmetic on
the id, never RNG state), so runs are reproducible and resumable — the
property that matters when a 100 TB job dies at 80%.

Scale shape: sampling and split assignment are stateless row-local
projections (no shuffle at all); packing is one window pass partitioned
by shard — each shard packs independently, which is exactly how a
distributed trainer consumes data (one packed stream per worker), so the
plan has no global ordering bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative hash constant (2^32 / phi). Cross-engine
# reproducible with plain BIGINT arithmetic — unlike xxhash64, any SQL
# engine can verify the sample. For adversarial id distributions swap in
# deterministic_fraction's md5 path.
_KNUTH = 2654435761


def _low_bits_times_knuth(id_col: str) -> F.Column:
    """``(id mod 2^31) * K mod 2^32`` — the 2^31 reduction BEFORE the
    multiply caps the product at ~5.7e18 (2^31 x ~2.65e9), under the
    2^63-1 ~ 9.2e18 BIGINT ceiling with ~1.6x headroom, so the BIGINT
    arithmetic can't overflow Spark's ANSI mode at any id (a raw
    ``id * K`` aborts for ids >= ~3.5e9 — real at corpus scale — while
    DuckDB would silently promote to HUGEINT and diverge). Ids 2^31 apart
    collide; acceptable for sampling, documented here.
    """
    return F.pmod(
        F.pmod(F.col(id_col).cast("long"), F.lit(1 << 31)) * F.lit(_KNUTH),
        F.lit(1 << 32),
    )


def _id_fraction(id_col: str) -> F.Column:
    """Deterministic pseudo-uniform fraction in [0, 1) from an integer id:
    multiplicative hashing on the low 31 bits (pmod keeps negatives out).
    """
    return _low_bits_times_knuth(id_col).cast("double") / F.lit(float(1 << 32))


def deterministic_stratified_sample(
    df: DataFrame,
    id_col: str,
    class_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-class deterministic subsampling — rebalance a corpus by keeping
    ``rates[class]`` of each class (id-hash order, not RNG), so the same
    input always yields the same sample and late-arriving partitions can't
    change earlier decisions. No shuffle: a row-local filter.
    """
    frac = _id_fraction(id_col)
    rate = F.lit(float(default_rate))
    for cls, r in sorted(rates.items()):
        rate = F.when(F.col(class_col) == cls, F.lit(float(r))).otherwise(rate)
    return df.filter(frac < rate)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    split_col: str = "split",
) -> DataFrame:
    """Assign a deterministic train/val/test split by id hash — stable
    across runs and engines, membership decided row-locally (no shuffle).
    """
    frac = _id_fraction(id_col)
    return df.withColumn(
        split_col,
        F.when(frac < val_fraction, F.lit("val"))
        .when(frac < val_fraction + test_fraction, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def mixture_sample_to_budget(
    df: DataFrame,
    id_col: str,
    class_col: str,
    tokens_col: str,
    budgets: dict[str, int],
    default_budget: int,
    tokens_before_col: str = "tokens_before",
) -> DataFrame:
    """Data-mixture sampling: cap each class (language/domain/quality bin)
    at a TOKEN budget, not a row fraction — how pretraining mixtures are
    actually specified ("300B tokens of web, 50B of code, ...").

    Documents are ranked inside their class by ``md5(id)`` — a
    deterministic shuffle both engines reproduce bit-identically, unlike
    RNG sampling — and the greedy prefix whose *preceding* cumulative
    token count is still under the class budget is kept (so the sample
    may overshoot by at most one document, never undershoot). Stable
    across runs, resumable, and late partitions can't change earlier
    decisions.

    Scale shape: one hash shuffle on the class key + one window pass;
    classes sample independently. Class cardinality is small (languages,
    domains) while rows-per-class is huge — if a single class outgrows
    one task's sort budget, pre-aggregate per-doc token counts first
    (they already are here) so the window sorts |docs|, not |tokens|.
    """
    order = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = (
        Window.partitionBy(class_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    budget = F.lit(int(default_budget))
    for cls, b in sorted(budgets.items()):
        budget = F.when(F.col(class_col) == cls, F.lit(int(b))).otherwise(budget)
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return df.withColumn(tokens_before_col, before).filter(
        F.col(tokens_before_col) < budget
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    context_tokens: int,
    n_shards: int = 32,
    shard_col: str = "shard",
    bin_col: str = "bin_id",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Concatenation-style sequence packing: assign each document to a
    fixed ``context_tokens`` window within its shard.

    Documents are streamed in deterministic id order per shard and the
    window id is ``floor(tokens_before / context_tokens)`` — the
    concatenate-then-chop packing LLM pretraining uses (a document may
    straddle a boundary; the trainer splits it). Shards pack
    independently (id-hash sharding), so the plan is one window pass
    partitioned by shard — no global ordering bottleneck; parallelism is
    ``n_shards`` regardless of corpus size.

    ``group_cols`` packs within (group × shard) instead — e.g. pass
    ``["split"]`` so train/val/test each pack their own windows and a
    val document can never share a context window with a train one.
    """
    shard = _low_bits_times_knuth(id_col) % F.lit(
        n_shards
    )
    part_cols = [*(group_cols or []), shard_col]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn(shard_col, shard.cast("int"))
    tokens_before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    return out.withColumn(
        bin_col, F.floor(tokens_before / F.lit(context_tokens)).cast("long")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment where near-duplicate documents can NEVER
    straddle splits: the split hash is computed on the connected-component
    representative id, not the document id, so an entire duplicate family
    moves as one unit — the eval-contamination guard published dedup
    studies call for (a val doc with a near-dup twin in train silently
    inflates eval scores).

    ``pairs`` is any near-dup pair table (id_a, id_b) from the dedup
    families; unpaired documents are their own representative. Cost on
    top of the plain split: the components computation (O(log diameter)
    rounds over |pairs|) plus one left join — the split itself stays a
    row-local hash.
    """
    from noaa_ais_glue_lakehouse_spark.operators.dedup import (
        connected_components,
    )

    comp = connected_components(pairs)
    rep = F.coalesce(F.col("component"), F.col(id_col)).alias("_rep")
    with_rep = df.join(
        comp.select(F.col("id").alias(id_col), "component"), id_col, "left"
    ).select(df["*"], rep)
    frac = _id_fraction("_rep")
    return with_rep.withColumn(
        split_col,
        F.when(frac < val_fraction, F.lit("val"))
        .when(frac < val_fraction + test_fraction, F.lit("test"))
        .otherwise(F.lit("train")),
    ).drop("_rep")
