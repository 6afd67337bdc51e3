"""Trained-BPE token counting (VERDICT r3 item 5): merge semantics,
trainer determinism, and Spark-UDF ≡ Python-twin equality."""

import pandas as pd
import pytest

from granulate_char_ocr_spark.functions import bpe


def test_trainer_is_deterministic_and_converges():
    texts = ["the cat sat on the mat", "the cat ran", "a cat sat"]
    m1 = bpe.train_bpe(texts, 50)
    m2 = bpe.train_bpe(texts, 50)
    assert m1 == m2
    # convergence: once every word is one symbol, no pairs remain
    assert len(m1) < 50
    ranks = {p: i for i, p in enumerate(m1)}
    assert bpe.bpe_symbols(" the", ranks) == ["Ġthe"]


def test_merge_order_follows_rank():
    # rank 0 merges first even when a later merge also applies
    ranks = {("a", "b"): 0, ("b", "c"): 1, ("ab", "c"): 2}
    assert bpe.bpe_symbols("abc", ranks) == ["abc"]
    ranks = {("b", "c"): 0}
    assert bpe.bpe_symbols("abc", ranks) == ["a", "bc"]


def test_count_tokens_accounting():
    ranks = {("a", "b"): 0}
    # 'ab ab' -> [ab] + [Ġ, ab] (no learned Ġ-merge in this toy table)
    assert bpe.count_tokens("ab ab", ranks, {}) == 3
    # a double space becomes one whitespace-run token; the second word
    # then carries no leading space
    assert bpe.count_tokens("ab  ab", ranks, {}) == 3
    # unknown pairs stay split per character
    assert bpe.count_tokens("xy", {}, {}) == 2
    # with a trained Ġ-merge the space folds into the word symbol
    ranks2 = {("a", "b"): 0, ("Ġ", "ab"): 1}
    assert bpe.count_tokens("ab ab", ranks2, {}) == 2


def test_committed_merges_load():
    ranks = bpe.load_ranks()
    assert len(ranks) > 50
    assert all(isinstance(k, tuple) and len(k) == 2 for k in ranks)


def test_spark_udf_matches_python_twin(spark):
    from granulate_char_ocr_spark.operators import textstats

    texts = [
        "the spark join stream a small order merge",
        "window merge spark merge batch table",
        "unseen zxqvw tokens stay split",
        "  doubled  spaces  and punct, too.",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_bpe_merged"]
        for r in textstats.bpe_token_count(docs, merged=True).collect()
    }
    ranks = bpe.load_ranks()
    want = {
        i: bpe.count_tokens(t, ranks, {}) for i, t in enumerate(texts)
    }
    assert got == want
    # the trained table compresses corpus words below the regex proxy
    corpus_like = texts[0]
    proxy = len(bpe.pretokenize(corpus_like))
    assert want[0] < proxy * 1.01 and want[0] >= len(corpus_like.split())


def test_giant_token_merges_in_linear_time():
    """Perf guard: a no-whitespace run (base64 blob, DNA string)
    pre-tokenizes as ONE token; the merge loop is quadratic per chunk, so
    over-long tokens merge in independent _MAX_MERGE_SPAN chunks (drift
    <= 1 symbol per boundary). 64k chars measured 77 s before chunking,
    0.40 s after — budget leaves ~10x for load drift."""
    import time

    ranks = bpe.load_ranks()
    tok = ("abcdefgh" * 8000)[:64000]
    t0 = time.perf_counter()
    n = len(bpe.bpe_symbols(tok, ranks))
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"64k-char token merge took {dt:.1f}s"
    # chunking must not change counts on a chunk-aligned repetition
    per_chunk = len(bpe.bpe_symbols("abcdefgh" * 64, ranks))
    assert n == (64000 // 512) * per_chunk


def test_short_tokens_unaffected_by_chunking():
    ranks = bpe.load_ranks()
    for tok in ["Hello", " world", "the", " antidisestablishmentarianism"]:
        parts = bpe.bpe_symbols(tok, ranks)
        assert parts == bpe._merge(bpe._to_symbols(tok), ranks)


def test_cache_skips_pathological_keys():
    ranks = bpe.load_ranks()
    cache = {}
    bpe.count_tokens("word " + "x" * 1000, ranks, cache)
    assert "word" in cache and not any(len(k) > 256 for k in cache)


def test_spark_trainer_matches_python_twin(spark):
    """Distributed BPE training: the Spark path (one word-count aggregate
    + driver merge loop over the weighted vocabulary) must learn the SAME
    merges list as the in-process trainer. ASCII corpus — the regime where
    the Java and stdlib-re pre-tokenizers are character-identical."""
    from granulate_char_ocr_spark.operators import textstats

    texts = [
        "the cat sat on the mat, then the cat ran.",
        "a cat sat; the mat sat still... 42 cats!",
        "  doubled  spaces &&symbols++ and CAPS Caps caps",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )
    got = textstats.train_bpe_spark(docs, n_merges=80)
    want = bpe.train_bpe(texts, 80)
    assert got == want
    assert len(got) > 10  # actually learned something


def test_spark_trainer_min_count_cut(spark):
    """min_count drops hapax pre-tokens from the collected vocabulary
    without touching merges won by repeated words (the 100 TB collect
    bound). 'zzqqxx' appears once: with the cut its internal pairs vanish
    from the count table, so no merge may reference its unique letters."""
    from granulate_char_ocr_spark.operators import textstats

    texts = ["aa bb aa bb aa bb zzqqxx", "aa bb aa bb"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )
    kept = textstats.train_bpe_spark(docs, n_merges=20, min_count=2)
    assert all("z" not in a + b and "q" not in a + b for a, b in kept)
    # the dominant repeated words still merge to single symbols
    ranks = {p: i for i, p in enumerate(kept)}
    assert bpe.bpe_symbols("aa", ranks) == ["aa"]
    assert bpe.bpe_symbols(" bb", ranks) == ["Ġbb"]


def test_spark_trainer_reproduces_committed_merges(spark):
    """The committed resources/bpe_merges.txt (trained in-process by
    tools/train_bpe.py) is byte-reproducible from the DISTRIBUTED
    trainer over the same sf0.01 corpus — the two pre-tokenizers agree
    on every word the corpus actually contains (incl. the CJK rows:
    both engines class Han as letters), so the word-count tables and
    hence every merge decision coincide."""
    from granulate_char_ocr_spark.operators import textstats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = textstats.train_bpe_spark(docs)
    ranks = bpe.load_ranks()
    committed = [p for p, _ in sorted(ranks.items(), key=lambda kv: kv[1])]
    assert got == committed
