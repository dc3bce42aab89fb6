"""BPE trainer/encoder: determinism, structural invariants, and
consistency with the oracle-checked pair statistics."""

from __future__ import annotations

import pytest

from streaming_data_ingestion_spark.bpe import (
    encode_documents,
    encode_word,
    train_bpe,
)
from streaming_data_ingestion_spark.registry import all_queries
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def merges(spark, docs):
    return train_bpe(docs, n_merges=30)


def test_first_merge_is_the_top_pair_stat(spark, docs, merges):
    """The trainer's first merge must be exactly the top row of the
    oracle-checked q_bpe_pair_stats — the two computations share one
    definition of 'most frequent adjacent pair'."""
    top = (
        all_queries()["q_bpe_pair_stats"].fn(spark, SF_DIR).limit(1).collect()
    )[0]
    assert merges[0][0] + merges[0][1] == top["pair"]


def test_train_is_deterministic(spark, docs, merges):
    assert merges == train_bpe(docs, n_merges=30)
    assert len(merges) == 30
    assert len(set(merges)) == 30  # a pair is merged at most once


def test_encode_reconstructs_and_compresses(spark, docs, merges):
    enc = encode_documents(docs, merges)
    rows = enc.collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(rows) == len(texts)
    total_tokens = total_chars = 0
    for r in rows:
        words = [w for w in texts[r["doc_id"]].strip().split(" ") if w]
        assert r["n_words"] == len(words)
        # lossless: token concatenation reproduces the exact text
        assert r["tokens"].replace(" ", "") == "".join(words)
        assert r["n_tokens"] == len(r["tokens"].split(" "))
        total_tokens += r["n_tokens"]
        total_chars += sum(len(w) for w in words)
    # merges genuinely compress: 30 merges reach ~0.65 tokens/char on
    # the fixture corpus (and more merges only improve it — see
    # test_more_merges_never_add_tokens)
    assert total_tokens < total_chars * 0.75


def test_more_merges_never_add_tokens(spark, docs):
    short = train_bpe(docs, n_merges=10)
    long = train_bpe(docs, n_merges=30)
    assert long[:10] == short  # greedy prefix property
    n_short = sum(
        r["n_tokens"] for r in encode_documents(docs, short).collect()
    )
    n_long = sum(
        r["n_tokens"] for r in encode_documents(docs, long).collect()
    )
    assert n_long <= n_short


def test_encode_word_only_emits_learned_symbols(merges):
    learned = {a + b for a, b in merges}
    for w in ("table", "window", "spark", "x", ""):
        toks = encode_word(w, {p: i for i, p in enumerate(merges)})
        assert "".join(toks) == w
        for t in toks:
            assert len(t) == 1 or t in learned


def test_merge_table_round_trips(spark, docs, merges, tmp_path):
    """Train-once / encode-everywhere: the persisted merge table
    reloads identically and produces identical encodings."""
    from streaming_data_ingestion_spark.bpe import load_merges, save_merges

    p = str(tmp_path / "merges.json")
    save_merges(merges, p)
    again = load_merges(p)
    assert again == merges
    a = {r["doc_id"]: r["tokens"] for r in encode_documents(docs, merges).collect()}
    b = {r["doc_id"]: r["tokens"] for r in encode_documents(docs, again).collect()}
    assert a == b


def test_q_bpe_encode_matches_pure_python_replay(spark):
    """The registered rows-only query's per-source totals must equal a
    pure-Python replay (train + encode_word on collected fixture docs) —
    the oracle substitute for a non-SQL-expressible iterative operator."""
    from collections import defaultdict

    from streaming_data_ingestion_spark.bpe import encode_word, train_bpe

    docs = load(spark, SF_DIR, "documents")
    merges = train_bpe(docs, n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    expect = defaultdict(lambda: [0, 0, 0])  # docs, words, tokens
    for r in docs.select("source", "text").collect():
        words = [w for w in str(r["text"]).strip().split(" ") if w]
        toks = sum(len(encode_word(w, ranks)) for w in words)
        e = expect[r["source"]]
        e[0] += 1
        e[1] += len(words)
        e[2] += toks
    got = {
        r["source"]: (r["n_docs"], r["total_words"], r["total_tokens"])
        for r in all_queries()["q_bpe_encode"].fn(spark, SF_DIR).collect()
    }
    assert got == {s: tuple(v) for s, v in expect.items()}
