"""Unit tests for the BPE tokenizer (ops/tokenize.py): merge learning on
the canonical Sennrich corpus, encode/train segmentation agreement, OOV
behavior, and the distributed encode plan shape."""

import hashlib

import pytest

from extractor.ops.tokenize import (
    END_OF_WORD,
    bpe_encode,
    encode_word,
    learn_merges,
    word_counts,
)

# the worked example from Sennrich et al. 2016 §3.2
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_sennrich_head():
    merges = learn_merges(SENNRICH, 4)
    # round 1: ('e','s') appears in newest(6)+widest(3) = 9 — the max
    # round 2: ('es','t') same 9; round 3: ('est', '</w>') same 9;
    # round 4: ('l','o') in low(5)+lower(2) = 7
    assert merges == [("e", "s"), ("es", "t"), ("est", END_OF_WORD),
                      ("l", "o")]


def test_learn_merges_tie_is_lexicographic():
    # 'ab' and 'ba' both appear twice ('abab' c=1 has ab×2 + ba×1;
    # add 'ba' c=1 -> ba×2 with </w> variants).  Construct a clean tie:
    # words 'ab' (c=2) and 'ba' (c=2): pairs (a,b)=2, (b,a)=2,
    # (b,</w>)=2, (a,</w>)=2 — lexicographic min ('a','</w>') wins.
    merges = learn_merges([("ab", 2), ("ba", 2)], 1)
    assert merges == [("a", END_OF_WORD)]


def test_learn_merges_stops_when_no_repeats():
    # every pair unique -> frequency 1 < 2 -> no merges at all
    assert learn_merges([("abc", 1)], 10) == []


def test_encode_reproduces_training_segmentation():
    merges = learn_merges(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # replay training on 'newest': after enough merges the training
    # table collapses it to one or two symbols; encode must agree with
    # a direct training-side replay
    seqs = {w: list(w) + [END_OF_WORD] for w, _ in SENNRICH}
    for a, b in merges:
        for seq in seqs.values():
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i:i + 2] = [a + b]
                else:
                    i += 1
    for w, _ in SENNRICH:
        assert encode_word(w, ranks) == seqs[w], w


def test_encode_oov_falls_back_to_chars():
    merges = learn_merges(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    out = encode_word("zzq", ranks)
    # no learned merge applies -> pure character segmentation
    assert out == ["z", "z", "q", END_OF_WORD]


def test_word_counts_cap_and_order(spark):
    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a b")], "doc_id long, text string"
    )
    rows = word_counts(df, max_vocab=2).collect()
    assert [(r["word"], r["n"]) for r in rows] == [("b", 4), ("a", 3)]


def test_bpe_encode_distributed_matches_local(spark):
    corpus = [(i, " ".join(w for w, c in SENNRICH for _ in range(c)))
              for i in range(3)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = learn_merges(SENNRICH, 6)
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    toks = []
    for w, c in SENNRICH:
        for _ in range(c):
            toks.extend(encode_word(w, ranks))
    want_md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
    for i in range(3):
        assert out[i]["n_words"] == sum(c for _, c in SENNRICH)
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["tokens_md5"] == want_md5


def test_bpe_encode_null_and_empty(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bpe_encode(df, []).collect()}
    for i in range(3):
        assert out[i]["n_words"] == 0 and out[i]["n_tokens"] == 0
        assert out[i]["tokens_md5"] == hashlib.md5(b"").hexdigest()


def test_bpe_encode_map_only_plan(spark):
    """The distributed encode must be a pure map: no Exchange anywhere
    in its physical plan (the merge table travels by closure)."""
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = bpe_encode(df, [("a", "b")])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


from hypothesis import given, settings, strategies as st

_words = st.lists(
    st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=8),
              st.integers(min_value=1, max_value=20)),
    min_size=1, max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(_words)
def test_bpe_tokens_always_reconstruct_words(word_freq):
    """Merges only ever concatenate adjacent symbols, so joining a
    word's tokens must reproduce word + END_OF_WORD exactly — for any
    corpus, any merge count, any word (in-vocab or OOV)."""
    merges = learn_merges(word_freq, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in word_freq + [("zzzz", 1)]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END_OF_WORD
        assert 1 <= len(toks) <= len(w) + 1


@settings(max_examples=30, deadline=None)
@given(_words)
def test_bpe_more_merges_never_lengthen_encoding(word_freq):
    merges = learn_merges(word_freq, 10)
    for w, _ in word_freq:
        prev = None
        for k in range(len(merges) + 1):
            ranks = {p: i for i, p in enumerate(merges[:k])}
            n = len(encode_word(w, ranks))
            if prev is not None:
                assert n <= prev
            prev = n
