"""BPE tokenizer training + application — the vocabulary-building verb
of a pre-training data pipeline.

Every LLM corpus pipeline ends in a tokenizer; building one IS a
corpus-scale job (Sennrich et al. 2016; GPT-2's byte-level variant).
The reference engine has nothing like it (its tokenizer is a fixed
regex, /root/reference/utils/tokenizer.py); this module adds the verb
with the honest distributed decomposition:

* **word histogram (the scale part)**: BPE famously fits on the WORD
  FREQUENCY TABLE, not the raw corpus — one tokenize → explode →
  groupBy(word) pass collapses 100 TB of text to a vocabulary-sized
  table.  That pass is this module's only corpus-scale job.
* **fit (capped, exact, deterministic)**: the merge loop is inherently
  sequential (each merge depends on the previous), so running it as
  n_merges Spark jobs would be thousands of barriers over a tiny
  table.  Instead the top-``max_words`` rows by (freq desc, word asc)
  — the head that carries ~all the pair mass — collect to the driver
  (the ivf_centroids / classifier capped-fit discipline; the cap is a
  hard bound on driver memory) and the classic algorithm runs exactly:
  count adjacent symbol pairs weighted by word freq, merge the argmax
  with a DETERMINISTIC tie-break (count desc, pair lexicographic asc),
  repeat.  No RNG anywhere; same corpus → same vocab, bit-for-bit.
* **encode (distributed)**: merges broadcast to executors as a rank
  dict; an Arrow-batched pandas UDF applies them greedily
  (lowest-rank pair first — the standard BPE encode) per word, with a
  per-batch word cache (Zipf makes the hit rate ~the corpus's
  type/token ratio).

End-of-word marker: ``</w>`` appended to each word's symbol sequence
(the Sennrich convention) so merges distinguish word-final contexts.

Scale: fit input is one shuffle on word; encode is map-only.  The cap
is honest about what it drops: words below the top-``max_words`` head
still ENCODE fine (via merges learned from the head), they just don't
vote on which merges exist — the standard subsampled-fit posture.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

END = "</w>"
MAX_FIT_WORDS = 1_000_000


def word_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — lowercase, split on non-alnum,
    len ≥ 1 (BPE wants single-char words too; the engine tokenizer's
    len>1 rule is a SEARCH choice, not a tokenizer-training one)."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out, i, n = [], 0, len(syms)
    ab = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def fit_bpe(
    word_freq: DataFrame,
    n_merges: int,
    max_words: int = MAX_FIT_WORDS,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a (word, freq) frame.  The
    collect is HARD-CAPPED at ``max_words`` rows, taken by (freq desc,
    word asc) — deterministic head, bounded driver memory.  Returns
    merges in learned order (rank = list index)."""
    head = (
        word_freq.orderBy(F.desc("freq"), F.asc("word"))
        .limit(int(max_words))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in head:
        syms = tuple(r["word"]) + (END,)
        vocab[syms] = vocab.get(syms, 0) + int(r["freq"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            _merge_word(syms, best): freq for syms, freq in vocab.items()
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (the standard
    inference path — apply the EARLIEST-learned applicable merge)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — the corpus encoded with
    the learned merges.  Arrow-batched pandas UDF over a broadcast
    rank dict, per-batch word cache (Zipf hit rate)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, tokens array<string>, n_tokens int"

    import re

    splitter = re.compile(r"[^a-z0-9]+")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in splitter.split((text or "").lower()):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks_col, "n_tokens": n_col}
            )

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)


def bpe_token_stats(encoded: DataFrame, k: int = 30) -> DataFrame:
    """Top-k (token, count) of an encoded corpus — tie-break (count
    desc, token asc); the fertility/vocab-audit view."""
    return (
        encoded.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )
