"""access_log_aggregator_spark — a PySpark-native web-scale log pipeline.

A from-scratch parse -> enrich -> route -> aggregate engine over snapshot
tables of Common-Crawl-style web pages, re-expressing the semantics of the
reference Go CLI ``mfzza/access-log-aggregator`` (see SURVEY.md) as an
idiomatic Spark DataFrame job:

- vectorized (Arrow/pandas-UDF) payload extraction, byte-identical to the
  pure-Python oracle by construction (shared compiled regexes);
- Catalyst-only field parsing/validation (regexp_extract + try_cast — no
  Python on the per-field path);
- broadcast-join enrichment, fan-out routing to parsed/unparsed/bot/error
  sinks, salted + AQE-assisted aggregation;
- snapshot-incremental, checkpoint-resumable execution with per-partition
  lineage and observed metrics.
"""

__version__ = "0.1.0"
