"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference repo ``lmsalazae/pyspark-data-processing-challenge``
(config-driven batch ETL: schema-declared CSV read, dedup, date/country/
delivery filters, indicator columns, null fill, unit standardization,
data-quality gates, partitioned parquet write — see SURVEY.md §2),
extended with the operators a large-scale LLM training-data pipeline
needs (dedup families, similarity search, multimodal plumbing, text
analysis), every one designed for a 1000-executor / 100 TB deployment:

- declarative DataFrame plans so Catalyst does pushdown/pruning/AQE;
- no driver-side ``collect()`` loops, no full-table ``count()`` gates;
- broadcast for dimension joins, keyed dedup instead of all-column;
- Arrow-batched pandas UDFs only where built-ins can't express the op.
"""

__version__ = "0.1.0"
