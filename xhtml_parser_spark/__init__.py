"""xhtml_parser_spark: a PySpark-native XHTML parsing and main-content
extraction engine with the query/data-processing capabilities of the
reference engine (turgu1/xhtml_parser), re-expressed Spark-first.

Layers:
  kernel/     pure-Python/NumPy batch kernels (no Spark dependency):
              parser, packed-array DOM, navigation API, golden
              serializer, boilerplate stripping
  operators/  DataFrame-level operators: parse/extract (mapInPandas),
              dedup (exact / minhash-LSH / simhash), similarity search,
              text analysis
  sources/    pages-table synthesis, snapshot/commit table layer
              (Iceberg-style, parquet fallback), lineage
  functions/  column-level helper functions (pyspark.sql.functions
              compositions)
  plans/      end-to-end job assembly (extract pipeline w/ partitioning,
              salting, lineage, resume)
  streaming/  Structured Streaming variants of the extract pipeline
"""

__version__ = "0.1.0"
