"""PySpark-native main-content extraction engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference converter (Trinq2003/document-converter) as a Spark DataFrame
pipeline over multi-turn transcript tables:

- ``extractor.kernel``    — the pure T2–T10 extraction function (Arrow-batched)
- ``extractor.pipeline``  — DataFrame pipeline: partition/salt/sort/extract
- ``extractor.checkpoint``— partition-level checkpoint + resume (left-anti join)
- ``extractor.metrics``   — per-partition lineage + throughput metrics
- ``extractor.transcripts``— deterministic synthetic transcripts generator
- ``extractor.ops``       — training-data-pipeline operators (dedup,
                             similarity, text stats, multimodal plumbing)

Deployable via ``spark-submit --py-files extractor.zip`` (see scripts/make_zip.sh).
"""

__version__ = "0.1.0"
