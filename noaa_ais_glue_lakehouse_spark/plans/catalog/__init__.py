"""Query catalog package (round-8 split of the single-file
catalog.py). Importing this package registers every catalog query;
the public surface (queries/oracle_sql/register/...) is
unchanged from the single-file era.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    allow_non_equi_queries,
    baseline_only_queries,
    build_time_exec_queries,
    get_query,
    oracle_sql,
    queries,
    register,
    scaling_adjudicated_queries,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.tpch import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.dedup import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.retrieval import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.text import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.geo import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.timeseries import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.stats import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.stats_tests import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.inference import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.profiling import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.textml import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.events import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.graph import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.streaming import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.lakehouse import *  # noqa: F401,F403
from noaa_ais_glue_lakehouse_spark.plans.catalog.multimodal import *  # noqa: F401,F403

# smoke.py composes its oracles from the registered oracle texts of the
# modules above — it must stay the LAST catalog import
from noaa_ais_glue_lakehouse_spark.plans.catalog.smoke import *  # noqa: F401,F403
