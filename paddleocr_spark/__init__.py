"""paddleocr_spark — a PySpark-native main-content extraction engine.

Re-creates the reference's staged detect→order→classify→recognize→
assemble dataflow as a DOM/byte-stream analog over Common-Crawl-style
page tables, plus the corpus-scale operator suite (dedup, similarity
search, text analysis, multimodal plumbing). See README.md, SURVEY.md
and COVERAGE.md.

A regular (non-namespace) package on purpose: zipimport — used by
``spark-submit --py-files`` and ``SparkContext.addPyFile`` — does not
resolve PEP-420 namespace packages, so executors importing this code
from a shipped zip need this file to exist.
"""
