"""Ingest-node processor machinery re-expressed as Catalyst column plans.

The simple processors (set/rename/convert/gsub/kv/html_strip/…,
`modules/ingest-common` IngestCommonModulePlugin.java:81-111) are 1:1
`pyspark.sql.functions` expressions and are exercised inline by the
`ingest_*` gates. This package holds the processors that need real
compilation machinery: grok and dissect (`opensearch_spark/ingest/grok.py`).
"""
