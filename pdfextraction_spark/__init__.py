"""pdfextraction_spark — a from-scratch PySpark-native main-content
extraction engine with the query/data-processing capabilities of the
reference repo manikumarthati/pdfExtraction (see SURVEY.md).

Layout:
- oracle/    loop-based golden extractor (pytest oracle, no Spark)
- kernels/   vectorized NumPy/pandas Arrow-batch kernels (hot path)
- operators/ Spark DataFrame operators (extract stage, partitioning,
             conversation-level merge)
- sources/   transcripts source + checkpoint-manifest (resume)
- functions/ column-level functions (dedup, similarity, text quality)
- pipeline.py end-to-end batch job; cli.py spark-submit entry
"""

__version__ = "0.1.0"
