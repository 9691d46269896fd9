"""Byte-pair-encoding tokenizer: distributed training + encoding.

The canonical LLM-pipeline tokenizer (Sennrich et al. 2016, the
GPT-2/RoBERTa shape).  The scale split follows production trainers:

- **word counting is distributed** — the only pass over the corpus
  (groupBy word, sum count; at 100 TB this is the standard
  hash-aggregate with map-side combine);
- **merge learning runs on the driver over the BOUNDED distinct-word
  frequency table** (capped at ``max_vocab_words`` by frequency —
  what real trainers do: the merge loop needs global argmax per step,
  which no distributed plan beats for a table this small);
- **encoding is distributed** — Arrow-batched mapInPandas over the
  broadcast merge ranks, with a per-batch word cache (Zipf: a few
  thousand distinct words cover most tokens).

Determinism: ties in pair counts break lexicographically, so the
learned merges are independent of partitioning (pinned by test).

End-of-word marker: the trailing ``</w>`` convention, so detokenize
is exact whitespace-joined reconstruction (roundtrip is lossless for
whitespace-normalized text — the q-gate invariant).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"  # end-of-word marker (multi-char: single chars of
#                the initial alphabet can never collide with it)


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Distributed (word, count) — one corpus pass, map-side combined."""
    return (df.select(F.explode(F.split(F.trim(F.col(text_col)),
                                        r"\s+")).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("cnt")))


def train_bpe(df: DataFrame, text_col: str, n_merges: int = 100,
              max_vocab_words: int = 50_000) -> list[tuple[str, str]]:
    """Learn *n_merges* merge rules.  The corpus pass is distributed;
    the merge loop runs over the top ``max_vocab_words`` distinct
    words (count-desc, word-asc — deterministic under any
    partitioning)."""
    rows = (word_counts(df, text_col)
            .orderBy(F.desc("cnt"), F.asc("word"))
            .limit(max_vocab_words).collect())
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(r["cnt"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        # deterministic argmax: count desc, pair lexicographic asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word)
    sym.append(_EOW)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_texts(df: DataFrame, text_col: str, id_col: str,
                 merges: list[tuple[str, str]]) -> DataFrame:
    """-> (id, tokens array<string>, n_tokens).  Arrow-batched; the
    merge table broadcasts (it is n_merges entries — constant); a
    per-batch word cache exploits the Zipf head."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)})
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches):
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks_col, counts = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                ids.append(did)
                toks_col.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame({"id": ids, "tokens": toks_col,
                                "n_tokens": counts})

    return df.mapInPandas(
        run, f"id {id_type}, tokens array<string>, n_tokens long")


def detokenize(tokens: list[str]) -> str:
    """Exact inverse for whitespace-normalized text: tokens carry the
    end-of-word sentinel; words re-join with single spaces."""
    return "".join(tokens).replace(_EOW, " ").strip()
