"""methyl_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference methylation pipeline
(``hyunkyoun/methyl_data_pipeline``) as lazy, idiomatic Spark
DataFrame/SQL programs over a long-form fact table, plus
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) and a Structured Streaming module.

Layout
------
- ``session``    SparkSession builder (Arrow on, AQE on)
- ``model``      canonical long-form schema + wide⇄long converters
- ``io``         sources & sinks (CSV/Excel/FinalReport/parquet/IDAT-stub)
- ``operators``  relational + QC operators (filters, joins, set ops, top-k)
- ``functions``  scalar expression helpers (M-value, clamp, normalization)
- ``stats``      BH-FDR, limma-style moderated t, ComBat, BMIQ, PCA
- ``ext``        dedup / similarity / text-analysis / multimodal
- ``streaming``  Structured Streaming over event tables
- ``plans``      end-to-end pipeline assembly (the workflow.R equivalent)

Every operator is a pure ``DataFrame -> DataFrame`` function: no
mutation, no temp files, no subprocess bridges. Design target is a
1000-executor cluster over ~100 TB; local[*] is only the test harness.
"""

__version__ = "0.1.0"
