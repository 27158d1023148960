"""etl_python_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark implementation of the query and
data-processing capabilities surveyed from the reference BI/ETL
platform (see SURVEY.md).  Everything is expressed as lazy DataFrame /
Spark SQL plans so Catalyst handles pushdown, pruning, join selection
and AQE; Python UDFs appear only where semantics genuinely require
procedural code (grouped ML fits), and then always as Arrow-batched
pandas UDFs.

Layout
------
- ``session``    : SparkSession factory tuned for large-scale runs
- ``sources``    : readers (csv/excel/parquet/jdbc/json) and writers
- ``functions``  : scalar column-expression library (pt-BR cleaning,
                   dates, validation, formatting)
- ``model``      : schema registry, calendar dimension, profiler,
                   star-schema tooling
- ``operators``  : the analytics query family + large-scale data
                   pipeline operators (dedup, similarity, text)
- ``streaming``  : structured-streaming file pipelines
- ``ml``         : grouped forecasting via applyInPandas
- ``plans``      : SQL view surface of the report family
- ``enrich``     : REST enrichment clients (CNPJ/PTAX/IBGE)
"""

__version__ = "0.1.0"
