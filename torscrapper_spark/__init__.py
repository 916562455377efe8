"""torscrapper_spark — a PySpark-native URL-frontier crawl engine.

A from-scratch, Spark-first re-expression of the capabilities of
scorelab/TorScrapper (a sequential Python onion-site crawler; see
SURVEY.md §0 for the evidence policy — the reference directory is
empty, so behavior is reconstructed from BASELINE.json + public
knowledge, never from reference source).

Layout:
  functions/   pure kernels (URL canonicalization, image codecs) + pandas UDFs
  operators/   crawl dataflow operators (seen-filter, politeness, priority,
               fetch, link extraction, global sequence)
  sources/     snapshot table I/O (versioned parquet + manifest commit; the
               sandbox stand-in for Iceberg snapshots)
  plans/       the wave-loop crawl driver
  streaming/   Structured Streaming surface over the events table
  fixtures.py  deterministic synthetic onion-graph generator
  refsim.py    pure-Python reference crawl simulator (golden oracle)
"""

__version__ = "0.1.0"
