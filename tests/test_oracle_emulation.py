"""Oracle-emulation guard: the DuckDB SQL oracles that rebuild Python
kernels (the prose fast path in ``extract_documents``, the simhash
fingerprint) must stay byte-exact on inputs the *current* test corpus
happens not to contain — backslash runs, '>' chunk boundaries, CR/FF/VT
anchors, empty-token documents.  A corpus refresh must produce a red
CORRECTNESS row only for a real kernel bug, never for oracle drift
(round-2 ADVICE: the consuming-backslash and empty-token divergences were
latent exactly because the corpus was too clean to trip them).

Domain note: the emulation targets the synthesizer's domain — ASCII
whitespace and digits (Python ``\\s``/``\\d`` are unicode-aware, RE2's are
not) and no ``<``/``&`` (those route the kernel to the DOM slow path,
which the prose oracle deliberately does not model).
"""

import pandas as pd
import pytest

# ASCII-domain adversarial corpus: every known sharp edge of the
# escape/collapse/blockquote emulation plus simhash degenerate docs.
TEXTS = [
    None,
    "",
    "   \n\t  ",
    "plain prose, nothing special at all",
    "1. not a list\n2. still prose",
    "  23. indented number\n\t+ tab plus\n - spaced dash",
    "\r1. carriage return anchor",
    "\x0c+ formfeed anchor\n\x0b- vtab anchor",
    ">1. after gt\nscores >2. mid >3. multi",
    "foo >+ bar >- baz >>- double",
    "> 7. spaced after gt",
    "a \\* escaped star",
    "run \\\\* double run",
    "three \\\\\\* odd run",
    "tail backslash \\",
    "tail double \\\\",
    "mid \\\\ space and \\\\. dot",
    "- - -\n+ +\n1. 2. 3.",
    "1.\n2. y",
    "dash-> arrow >-> weird",
    ">",
    "> >",
    "10. ten\n100. hundred x",
    "\\",
    "\\.",
    "a>b>c>1. d",
    "> leading quote line",
    ">> double quote 1. num",
]


@pytest.fixture(scope="module")
def adversarial_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf")
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(TEXTS)),
            "text": pd.array(TEXTS, dtype="string"),
            "lang": ["en"] * len(TEXTS),
            "source": ["synthetic"] * len(TEXTS),
            "n_chars": [len(t) if t is not None else 0 for t in TEXTS],
        }
    )
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def adversarial_con(adversarial_sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{adversarial_sf}/documents.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["extract_documents", "dedup_simhash", "s9_pdf_export"]
)
def test_oracle_matches_kernel_on_adversarial_corpus(
    spark, adversarial_sf, adversarial_con, name
):
    import __spark_entry__ as entrymod

    from driver_sim import compare_query

    ok, msg = compare_query(
        spark,
        adversarial_con,
        entrymod.queries()[name],
        entrymod.oracle_sql()[name],
        adversarial_sf,
    )
    assert ok, msg
