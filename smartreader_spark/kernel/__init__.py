"""Pure-Python extraction kernel (no Spark imports allowed here).

The kernel maps ``(html, base_uri, options) -> (article_spans, metadata,
metrics)`` and is executed inside Arrow-batched ``mapInPandas`` on the
cluster, or directly by pytest locally.
"""
