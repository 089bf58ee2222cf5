"""Large-scale training-data pipeline operators (extension beyond the
reference — SURVEY.md §7 M7): deduplication, similarity search, text
analysis, multimodal column plumbing.

All hot paths are native Catalyst expressions (higher-order array
functions, hash-based signatures); Python appears only in the clearly
marked multimodal decode stubs (Pandas-UDF plumbing with fake decoders —
the image/audio libraries are not in this container).
"""

from processo_etl_spark.ml import dedup, similarity, textstats  # noqa: F401
