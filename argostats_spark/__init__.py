"""argostats_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference engine (pvthinker/argostats).

The reference is a single-node NumPy + multiprocessing pipeline over the Argo
ocean-float database (see /root/reference). This package re-expresses every
operator in its inventory (SURVEY.md §2) as idiomatic Spark DataFrame / SQL /
Structured Streaming plans so the same computations scale from a laptop to a
1000-executor cluster, and adds the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing) the
reference lacks.

Layout
------
- ``session``    SparkSession factory tuned for the workload
- ``schemas``    StructType schemas for the Argo data model (SURVEY.md §1)
- ``functions``  scalar/array/geo/date/QC/text column-expression library
- ``sources``    table loaders, synthetic Argo generator, NetCDF adapters
- ``operators``  summary build, interpolation, spatial join, atlas,
                 dedup, similarity, text analysis, multimodal
- ``streaming``  Structured Streaming ingest / incremental climatology
- ``plans``      plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
