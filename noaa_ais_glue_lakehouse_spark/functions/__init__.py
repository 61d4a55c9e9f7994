"""Scalar column-expression kernels (all JVM-side / codegen-friendly)."""

from noaa_ais_glue_lakehouse_spark.functions.spatial import (  # noqa: F401
    geohash_expr,
    grid_cell,
    haversine_km,
)
from noaa_ais_glue_lakehouse_spark.functions.hashing import (  # noqa: F401
    content_fingerprint,
    content_hash_sha256,
    minhash_signature,
    simhash64,
)
from noaa_ais_glue_lakehouse_spark.functions.text import (  # noqa: F401
    char_ngrams,
    quality_features,
    tokenize,
)
