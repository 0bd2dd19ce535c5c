"""lexoid_spark — a brand-new PySpark-native rebuild of Lexoid's
STATIC_PARSE document-conversion path (reference: oidlabs-com/Lexoid,
studied at /root/reference).

Architecture (SURVEY.md §1.3, §7):

- extraction *kernels* (HTML→markdown, PDF layout parse, CSV→pipe table,
  heading segmentation) are pure-Python, vectorized through pandas/Arrow
  UDFs — one Python call per Arrow batch, never per row;
- *orchestration* (doctype routing, error quarantine, page re-assembly,
  skew handling, lineage, checkpoint/resume) is native DataFrame ops so
  Catalyst plans, prunes and pushes down;
- input is a Common-Crawl-style ``pages(url, warc_ts, html, text, lang)``
  table (BASELINE.json::input_hint), columnar at rest (parquet/Iceberg via
  the TableIO seam), Arrow-columnar in flight.
"""

__version__ = "0.1.0"
