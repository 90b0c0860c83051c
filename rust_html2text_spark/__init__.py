"""PySpark-native HTML→text extraction engine.

A from-scratch reimplementation of the semantics of
``jugglerchris/rust-html2text`` (reference at /root/reference, v0.17.1),
re-expressed Spark-first: the rendering engine is a pure-Python scalar
transform (``rust_html2text_spark.engine``) executed as vectorized
pandas/Arrow UDFs over DataFrames of Common-Crawl-style pages
(``rust_html2text_spark.operators``), with partitioning / skew / lineage /
resume handled at the DataFrame level.
"""

__all__ = ["html_to_text", "Config", "plain_config", "TooNarrow"]
__version__ = "0.1.0"


def __getattr__(name):  # lazy to keep `import rust_html2text_spark` light
    if name in __all__:
        from rust_html2text_spark.engine import api

        return getattr(api, name)
    raise AttributeError(name)
