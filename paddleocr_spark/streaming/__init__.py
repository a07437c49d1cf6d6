"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.10) — its
incremental story is file-striping restarts. This package is the honest
Spark-native extension: the same stage functions run unchanged under
``readStream`` because every per-document operator is a pure function of
its row; streaming adds only source/sink/watermark plumbing.
"""
