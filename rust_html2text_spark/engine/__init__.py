"""Pure-Python HTML→text engine (no Spark imports).

Re-derives the rendering semantics of jugglerchris/rust-html2text v0.17.1
(reference at /root/reference/src/lib.rs and src/render/text_renderer.rs)
so that extracted text is byte-identical per document.  This package is
shipped to executors via --py-files and executed inside Arrow-batched
pandas UDFs; nothing in here may import pyspark.
"""
