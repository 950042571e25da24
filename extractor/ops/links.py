"""Anchor/link extraction — the link-graph side table of a web-scale
curation pipeline (URL frontier seeding, per-domain quality rollups,
link-based dedup all start from this shape).

Reference parity: the reference renders ``a[href]`` inline as markdown
links during the html2text pass (our ``extractor/linearize.py:185-193``
reproduces that, per html2text's skip_internal_links config); it never
*surfaces* the links as data.  This op runs the SAME stdlib DOM parser
(``extractor/dom.py``) over the HTML and emits one row per anchor — the
structured companion to the inline rendering, in the same family as the
dedup/sampling extensions (first-class training-pipeline operators
beyond the reference's own surface).

Scale posture (100 TB): a single map-only Arrow stage — ``mapInPandas``
parses each batch and yields the exploded per-link rows directly (no
Spark-side explode, no shuffle, no UDF in the hot columns afterward);
``domain`` is derived JVM-side with ``F.parse_url`` so the only Python
work is the DOM walk itself.  Output partitioning follows the input, so
a downstream per-domain rollup is the usual single agg shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINK_SCHEMA = "doc_id long, href string, anchor string"


def extract_links(df: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """One output row per ``<a href=...>`` in *html_col* (document order,
    nested anchors' text included verbatim): ``(doc_id, href, anchor,
    is_internal, domain)``.  ``is_internal`` marks fragment-only links
    (``#...``); ``domain`` is the lowercased host for absolute URLs, null
    otherwise.  Anchors with no ``href`` attribute are not links and are
    skipped (same rule as the linearizer's inline rendering)."""
    from ..dom import parse_html

    def kernel(iterator):
        import pandas as pd

        for batch in iterator:
            ids, hrefs, anchors = [], [], []
            for doc_id, html in zip(batch[id_col], batch[html_col]):
                if html is None:
                    continue
                try:
                    root = parse_html(html)
                except Exception:
                    continue  # per-unit containment: bad HTML emits no rows
                for el in root.find_all(["a"]):
                    href = el.get("href")
                    if href is None:
                        continue
                    ids.append(int(doc_id))
                    hrefs.append(href)
                    anchors.append(el.get_text())
            yield pd.DataFrame({"doc_id": ids, "href": hrefs, "anchor": anchors})

    out = df.select(F.col(id_col), F.col(html_col)).mapInPandas(
        kernel, LINK_SCHEMA
    )
    return out.select(
        "doc_id",
        "href",
        "anchor",
        F.col("href").startswith("#").alias("is_internal"),
        F.lower(F.parse_url("href", F.lit("HOST"))).alias("domain"),
    )
