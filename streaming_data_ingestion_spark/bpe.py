"""BPE tokenizer: distributed training statistics + Arrow-batched apply.

Completes the tokenizer-training story started by ``q_bpe_pair_stats``
(queries/llm_text.py): train the merge table, then encode the corpus
with it.

Scale posture — split exactly where production trainers split:

- **The corpus-sized pass is the word count.** ``train_bpe`` runs ONE
  distributed explode → map-side-combined ``groupBy(word)`` — the only
  stage that touches every token position. What it collects is the
  (word, freq) vocabulary: ~10⁷ rows at 100 TB, megabytes. This is the
  same design as HuggingFace/SentencePiece trainers, which hold the
  word-count table in memory; distributing the merge LOOP would add a
  vocab-sized shuffle per merge for no benefit.
- **The merge loop is driver-side and deterministic.** Greedy highest
  pair frequency, ties broken lexicographically — two runs (or an
  offline replica) produce the identical merge table.
- **Apply is embarrassingly parallel.** ``encode_documents`` broadcasts
  the merge-rank table into a ``mapInPandas`` — each document encodes
  row-locally with a per-batch word memo (Zipf makes the memo hit rate
  ≈ the token/type ratio), no shuffle, no state. At 100 TB this is a
  pure scan-speed map, the same cost class as the quality classifier.

Reference parity note: the reference repo has no tokenizer surface;
this module is §2B north-star breadth beside ml/ and queries/llm_text.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame) -> DataFrame:
    """The one corpus-sized pass: (word, freq) with map-side combine."""
    toks = F.filter(
        F.split(F.trim(F.col("text")), " "), lambda t: t != ""
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_stats(vocab: list[tuple[tuple[str, ...], int]]) -> Counter:
    stats: Counter = Counter()
    for symbols, freq in vocab:
        for a, b in zip(symbols, symbols[1:]):
            stats[(a, b)] += freq
    return stats


def _merge_word(
    symbols: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, merged = 0, pair[0] + pair[1]
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == pair[0]
            and symbols[i + 1] == pair[1]
        ):
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(docs: DataFrame, n_merges: int = 50) -> list[tuple[str, str]]:
    """Greedy BPE merges from the corpus; deterministic (freq desc, pair
    lexicographic asc tie-break). The collect is the word VOCABULARY —
    bounded and documented above — never the token stream."""
    rows = word_counts(docs).collect()
    vocab = [(tuple(r["word"]), int(r["freq"])) for r in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        pair = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        vocab = [(_merge_word(s, pair), f) for s, f in vocab]
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (lowest rank first) —
    the standard BPE encode loop."""
    symbols = tuple(word)
    while len(symbols) > 1:
        best = min(
            (
                (ranks[p], p)
                for p in zip(symbols, symbols[1:])
                if p in ranks
            ),
            default=None,
        )
        if best is None:
            break
        symbols = _merge_word(symbols, best[1])
    return list(symbols)


def encode_documents(
    docs: DataFrame, merges: list[tuple[str, str]], passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Row-local corpus encode: (doc_id, n_words, n_tokens, tokens) with
    tokens serialized space-joined (scalar column — the repo's
    array-output rule). mapInPandas with a per-batch word memo; the
    merge-rank dict rides in the task closure (merge tables are a few
    thousand entries — kilobytes).

    ``passthrough`` columns ride through the map unchanged so a
    downstream group-by (per-source token accounting) needs no join back
    to the corpus — at scale a doc_id equi-join purely to recover a
    grouping column would be a second full shuffle for nothing.
    """
    ranks = {p: i for i, p in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = {"doc_id": [], "n_words": [], "n_tokens": [], "tokens": []}
            for c in passthrough:
                out[c] = list(pdf[c])
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in str(text).strip().split(" ") if w]
                toks: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_tokens"].append(len(toks))
                out["tokens"].append(" ".join(toks))
            yield pd.DataFrame(out)

    extra = "".join(
        f", {c} {docs.schema[c].dataType.simpleString()}" for c in passthrough
    )
    return docs.select("doc_id", "text", *passthrough).mapInPandas(
        run,
        schema=f"doc_id long, n_words long, n_tokens long, tokens string{extra}",
    )


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table as JSON — the artifact a training run
    ships to every later encode job (kilobytes; goes in the job's
    files/broadcast, not a data table)."""
    import json

    with open(path, "w") as f:
        json.dump(merges, f)


def load_merges(path: str) -> list[tuple[str, str]]:
    import json

    with open(path) as f:
        return [tuple(p) for p in json.load(f)]
