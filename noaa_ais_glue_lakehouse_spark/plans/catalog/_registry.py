"""Query registry: the name -> callable/oracle maps and the
``register`` decorator every domain module uses. Split out so
domain modules stay import-acyclic (round-8 package split).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

_ORACLES: dict[str, str] = {}

_BASELINE_ONLY: set[str] = set()

_ALLOW_NON_EQUI: dict[str, str] = {}

_BUILD_TIME_EXEC: dict[str, str] = {}

_SCALING_ADJUDICATED: dict[str, str] = {}



def register(
    name: str,
    oracle: str | None = None,
    baseline_only: bool = False,
    allow_non_equi: str | None = None,
    build_time_exec: str | None = None,
    scaling_adjudicated: str | None = None,
):
    """``baseline_only=True`` marks a deliberately O(n²) oracle anchor
    (brute-force ground truth for an LSH/prefix-filter scale path). Such
    queries stay in the catalog so the scale paths keep a measurable
    recall target, but downstream runners — and the plan-audit cartesian
    scan — treat them as non-production surfaces.

    ``allow_non_equi`` exempts the query from the plan audit's
    accidental-cartesian scan; the value MUST be a reason string
    explaining why the non-equi/cross join is deliberate and bounded
    (e.g. a 1-row scalar broadcast). The justification lives HERE, next
    to the query it describes — the audit derives its allowlist from the
    registry instead of a hand-maintained test-file set.

    ``build_time_exec`` (also a mandatory reason string) marks queries
    that execute driver-side work at plan-BUILD time (iterative
    components, k-means/BPE training rounds); the sweeping plan scan
    skips building them for speed, and their plans are pinned by their
    own recall/oracle tests instead.

    ``scaling_adjudicated`` (round 10, verdict ask #3 — also a mandatory
    reason string citing the SCALING.md section) marks a PRODUCTION
    query whose measured decade exponent exceeds the linear budget for a
    documented, data-adversarial reason that was adjudicated rather than
    fixed (e.g. q171: exact-semantics PPJoin whose worst case needs an
    adversarial flat vocabulary). The scaling gate
    (tools/check_scaling.py) derives its exemption list from THIS tag —
    plus ``baseline_only`` — instead of a Makefile comment, so the
    registry stays the single source of truth for scale claims."""
    for flag, label in ((allow_non_equi, "allow_non_equi"),
                        (build_time_exec, "build_time_exec"),
                        (scaling_adjudicated, "scaling_adjudicated")):
        if flag is not None and (not isinstance(flag, str) or len(flag) < 15):
            raise ValueError(
                f"register({name!r}): {label} must be a substantive reason "
                f"string, got {flag!r}"
            )

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if baseline_only:
            _BASELINE_ONLY.add(name)
        if allow_non_equi is not None:
            _ALLOW_NON_EQUI[name] = allow_non_equi
        if build_time_exec is not None:
            _BUILD_TIME_EXEC[name] = build_time_exec
        if scaling_adjudicated is not None:
            _SCALING_ADJUDICATED[name] = scaling_adjudicated
        return fn

    return deco



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)



def get_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    """Registry lookup for queries that COMPOSE another query (q62/q368
    reuse q61's pair stream, q433 audits q400's top-k) — a name-based
    indirection so composed queries never reference each other's defs
    directly (keeps the domain modules import-acyclic)."""
    return _QUERIES[name]



def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)



def baseline_only_queries() -> set[str]:
    """Names registered with ``baseline_only=True`` — deliberate
    brute-force oracle anchors, never production paths."""
    return set(_BASELINE_ONLY)



def allow_non_equi_queries() -> dict[str, str]:
    """name → reason for every query registered with a justified
    non-equi/cross join (bounded scalar broadcasts, literal spines)."""
    return dict(_ALLOW_NON_EQUI)



def build_time_exec_queries() -> dict[str, str]:
    """name → reason for every query that runs driver-side work at
    plan-build time (iterative/trained operators)."""
    return dict(_BUILD_TIME_EXEC)



def scaling_adjudicated_queries() -> dict[str, str]:
    """name → adjudication (reason + SCALING.md citation) for every
    production query exempted from the decade-scaling linear budget;
    the check_scaling gate derives its exemption list from this."""
    return dict(_SCALING_ADJUDICATED)


