"""One-shot mechanical splitter #2: plans/catalog/stats.py (7.2k lines,
76 queries — already above the <6k bar one round after the package
split) -> stats.py (calibration / effect sizes / privacy / robust
estimators) + stats_tests.py (rank & contingency hypothesis tests).

Round-8 verdict ask #3. Same mechanics as tools/split_catalog.py: every
@register+def block moves VERBATIM — only the module boundary and the
shared header are new — so the registry, oracle strings, and def-line
citations are preserved byte-for-byte. Verified by the full selfcheck.

Run from the repo root: python tools/split_stats.py
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
PKG = ROOT / "noaa_ais_glue_lakehouse_spark/plans/catalog"
SRC = PKG / "stats.py"
DST = PKG / "stats_tests.py"

# the rank / contingency / goodness-of-fit hypothesis-test shelf
TESTS = {
    "q143_chi_square_independence",
    "q202_ks_drift_test",
    "q210_kaplan_meier",
    "q220_auc_rank_sum",
    "q226_two_proportion_ztest",
    "q287_spearman_correlation",
    "q338_srm_check",
    "q374_ks_source_drift",
    "q376_fleiss_kappa",
    "q382_kendall_tau_b",
    "q405_msprt_always_valid",
    "q409_bh_fdr_screen",
    "q421_qq_table",
    "q426_dispersion_test",
    "q431_logrank_test",
    "q439_mcnemar_paired",
    "q442_kendalls_w",
    "q444_mantel_haenszel",
    "q448_kruskal_wallis",
    "q449_cochrans_q",
    "q450_dunn_posthoc",
    "q451_cliffs_delta",
    "q453_brown_forsythe",
    "q464_runs_test",
    "q465_jarque_bera",
    "q466_durbin_watson",
    "q470_by_fdr_screen",
    "q472_lin_concordance",
}

HEADER_TESTS = '''"""Rank, contingency, and goodness-of-fit hypothesis tests
(round-9 carve-out of the oversized stats.py; blocks moved verbatim).

See _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403
'''


def main() -> int:
    if DST.exists():
        print("stats_tests.py already exists — split already ran")
        return 0
    src = SRC.read_text()
    # split into blocks at each top-level @register
    starts = [m.start() for m in re.finditer(r"^@register\(", src, re.M)]
    header = src[: starts[0]]
    blocks = [
        src[s:e] for s, e in zip(starts, starts[1:] + [len(src)])
    ]
    moved, kept = [], []
    for b in blocks:
        name = re.search(r'@register\(\s*\n?\s*"([^"]+)"', b).group(1)
        (moved if name in TESTS else kept).append(b)
    assert len(moved) == len(TESTS), (
        f"matched {len(moved)} of {len(TESTS)} test blocks"
    )
    SRC.write_text(
        header.replace(
            "Statistical tests, effect sizes, calibration, privacy "
            "audits, robust estimators.",
            "Calibration, effect sizes, CIs, privacy audits, robust "
            "estimators (hypothesis tests live in stats_tests.py).",
        )
        + "".join(kept)
    )
    DST.write_text(HEADER_TESTS + "\n" + "".join(moved))
    init = PKG / "__init__.py"
    it = init.read_text()
    marker = (
        "from noaa_ais_glue_lakehouse_spark.plans.catalog.stats import *"
        "  # noqa: F401,F403\n"
    )
    assert marker in it
    it = it.replace(
        marker,
        marker
        + "from noaa_ais_glue_lakehouse_spark.plans.catalog.stats_tests "
        "import *  # noqa: F401,F403\n",
    )
    init.write_text(it)
    print(
        f"moved {len(moved)} blocks; stats.py "
        f"{len(SRC.read_text().splitlines())} lines, stats_tests.py "
        f"{len(DST.read_text().splitlines())} lines"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
