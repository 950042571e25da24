"""Training-data pipeline operators over the engine's tables.

Each module pairs a Spark DataFrame implementation with (where expressible)
an ANSI/DuckDB SQL oracle used by the driver's correctness gate:

- ``relational``  — filters/aggregations/joins/windows (reference §2.2/2.4/2.5)
- ``textops``     — cleanup chain (T10), token counting, quality scoring,
                    language-ID heuristic, fingerprinting
- ``dedup``       — exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``  — brute-force cosine top-k + LSH-bucketed ANN
- ``multimodal``  — binary-column decode/feature plumbing (decode stubbed)
"""
