"""hive_lineage_spark — a PySpark-native analytics + lineage engine.

Rebuild of the capabilities of ``hbutani/hive-lineage`` (a Hive
post-execution column-lineage hook) on idiomatic Spark:

- ``sources``   — table registry over the driver's parquet TESTDATA.
- ``operators`` — the query surface (SURVEY.md §2.4 relational shapes,
  dedup, similarity search, text analysis, multimodal plumbing).
- ``plans``     — post-execution plan capture (QueryExecution → JSON →
  PlanNode), the analog of the reference's qinfo layer
  (``hivehook/.../hook/qinfo/QueryInfo.scala``).
- ``graph``     — immutable lineage-graph nodes with memoized
  ``transform_up`` (analog of ``lineage/GraphNode.scala:37-87``).
- ``rules``     — graph-normalization rules (analog of
  ``lineage/transform/rules/RemoveOperatorsRule.scala``).
- ``lineage``   — column-level lineage resolution (analog of
  ``hook/qinfo/SchemaMapping.scala``).
- ``metadata``  — catalog snapshot model (analog of
  ``core/.../metadata/*.scala`` + ``hook/ConvertHelper.scala``).
- ``streaming`` — Structured Streaming operators over the events table.
"""

__version__ = "0.1.0"
