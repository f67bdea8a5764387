"""PySpark-native full-text (BM25) analytics engine.

A from-scratch inverted-index build + BM25 top-k query engine over
Common-Crawl-style web pages, with the query/data-processing
capabilities of the reference (osmarks/meme-search-engine) re-expressed
Spark-first.  See SURVEY.md for the capability mapping.
"""

__version__ = "0.1.0"
