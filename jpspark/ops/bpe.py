"""Learned byte-pair-encoding tokenizer: train a merge table on a corpus
sample driver-side, replay the merges distributed (Arrow-batched kernel).

Public algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"). The reference pipeline has
no tokenizer at all — this belongs to the training-data surface the graft
adds on top of it; the regex-family heuristic proxy is retained at
``textstats.bpe_ish_token_count`` as the zero-Python fallback.

Conventions (shared by trainer, kernel, and oracle replay — any
deterministic convention works as long as all three agree):
  * words = whitespace split of the raw text; symbols never contain
    whitespace, so a merged symbol is always the concatenation of its
    parts and the pair (a, b) is recoverable from the merge list.
  * character symbols only, no end-of-word marker.
  * training tie-break: highest pair count, then LARGEST pair
    lexicographically (fully deterministic for any corpus order).
  * encoding = replay the merges in training order (merge #1 applied
    everywhere, then merge #2, ...), exactly the trainer's own update.

Scale shape: training runs on a bounded driver-side sample (the classic
approach at corpus scale — BPE statistics saturate quickly), the merge
table (a few KB) broadcasts, and the encode kernel is embarrassingly
parallel over documents with a per-worker distinct-word cache, so the
distributed pass is one mapPartitions-shaped projection: no shuffle.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Merge = tuple[str, str]


def train_bpe(texts, n_merges: int = 200, min_count: int = 2) -> list[Merge]:
    """Learn up to ``n_merges`` merges from the word-frequency table of
    ``texts``. Stops early when no adjacent pair reaches ``min_count``."""
    wf: Counter = Counter()
    for t in texts:
        wf.update(t.split())
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wf.items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges: list[Merge] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b))
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, merges: list[Merge], cache: dict | None = None) -> list[str]:
    """Tokenize one word by replaying the merge list in training order."""
    if cache is not None and word in cache:
        return cache[word]
    sym = list(word)
    for a, b in merges:
        if len(sym) < 2:
            break
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    if cache is not None:
        cache[word] = sym
    return sym


def token_count_py(text: str, merges: list[Merge], cache: dict | None = None) -> int:
    return sum(len(encode_word(w, merges, cache)) for w in text.split())


def bpe_token_count_col(merges: list[Merge]) -> Column:
    """Column: learned-BPE token count of a string column (arg via
    ``.alias``-style call: ``bpe_token_count_col(merges)(F.col('text'))``
    is avoided — returns a pandas_udf to apply to one column)."""

    # closure-captured so it persists across Arrow batches for the life
    # of the executor Python worker — inside the udf body it would be
    # rebuilt per ~8k-row batch and only dedupe within one batch
    cache: dict = {}

    @F.pandas_udf(T.LongType())
    def udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: token_count_py(t, merges, cache))

    return udf


def bpe_token_counts(
    docs: DataFrame,
    merges: list[Merge],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens) per document under a trained merge
    table. Merges ride the closure (broadcast by Spark task serialization;
    a 200-merge table is ~4 KB)."""
    udf = bpe_token_count_col(merges)
    from . import textstats

    return docs.select(
        F.col(id_col),
        textstats.token_count(F.col(text_col)).cast("long").alias("n_ws_tokens"),
        udf(F.col(text_col)).alias("n_bpe_tokens"),
    )
