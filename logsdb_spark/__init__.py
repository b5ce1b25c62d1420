"""logsdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``jwodder/logsdb`` reference.

The reference (read-only at /root/reference) is a streaming-ingest +
batch-analytics system: three log sources (Apache access logs, sshd auth
failures, RFC-5322 e-mail) are parsed and appended to relational tables,
and a daily report runs windowed aggregations over the last 24 hours.

This package re-expresses that surface Spark-first:

- ``sources/``    ingest parsers as column-expression pipelines
                  (reference: src/logsdb/apache_access.py:87-143,
                  authfail.py:65-97, maillog.py:141-163)
- ``operators/``  time windows, joins, aggregates, dedup, similarity,
                  multimodal plumbing
- ``functions/``  scalar/text/vector helpers (reference: core.py:51-65)
- ``plans/``      the registered query library (SURVEY.md §2 inventory)
- ``streaming/``  Structured Streaming ingest pipelines
- ``report/``     daily-report rendering (reference: dailyreport.py)

Everything is DataFrame/Catalyst-declarative; Python UDFs appear only
where built-ins cannot express the semantics (e-mail header parsing,
charset re-encode), and then as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
