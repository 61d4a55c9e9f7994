"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``SivaPrasath26/noaa-ais-glue-lakehouse``
(a PySpark-on-AWS-Glue medallion lakehouse), re-architected Spark-first:

- every pipeline stage is a pure function ``DataFrame -> DataFrame``
  (no Glue / S3 coupling anywhere);
- partition pruning, predicate pushdown, broadcast joins and AQE are
  delegated to Catalyst instead of hand-rolled driver loops;
- the single row-at-a-time Python UDF of the reference (geohash) is a
  native column expression here;
- training-data-pipeline operators (dedup families, ANN similarity,
  text quality, multimodal plumbing) extend the same operator style to
  100 TB-scale corpus work.

Package layout mirrors SURVEY.md §2's operator inventory:

- ``functions``  — scalar kernels (haversine, geohash, text metrics, hashing)
- ``operators``  — composite DataFrame transformers (cleaning, sessionize,
                   sampling, dedup, similarity, state)
- ``sources``    — readers/writers (schema-enforced, quarantine, snapshots)
- ``plans``      — the query catalog exposed through ``__spark_entry__``
- ``streaming``  — Structured Streaming analogs of the batch-simulated
                   stateful operators
- ``pipelines``  — end-to-end AIS medallion pipelines (raw->staging->curated)
"""

__version__ = "0.1.0"
