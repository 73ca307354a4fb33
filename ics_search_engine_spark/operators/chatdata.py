"""Chat/SFT training-data extraction over multi-turn transcripts —
the conversation-grain dataset-preparation verbs (the input table IS
(conv_id, turn_idx, role, text, tool, ts); these turn it into trainer
food).  Sibling of datapipe.py (document-grain packing/sampling) and
convs.py (conversation-grain SEARCH rollups): none of this exists in
the reference engine, which never looks at roles.

Scale notes: every window here partitions by conv_id — conversations
are bounded (thousands of turns at most), so the per-conversation sort
never approaches the banned global-window shape; everything else is
one conv-keyed aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def sft_pairs(
    transcripts: DataFrame,
    context_turns: int = 1,
    assistant_role: str = "assistant",
) -> DataFrame:
    """(conv_id, turn_idx, prompt, response) — one example per
    assistant turn with at least one preceding turn: ``response`` is
    the assistant turn's text, ``prompt`` is the previous
    ``context_turns`` turns rendered as ``role: text`` lines joined
    with newlines (the standard SFT-extraction shape; context_turns=1
    is plain (user, assistant) pairing, larger keeps history).

    One per-conversation window (bounded partitions), no shuffle
    beyond the conv exchange."""
    if context_turns < 1:
        raise ValueError("context_turns must be >= 1")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    line = F.concat_ws(": ", F.col("role"), F.coalesce("text", F.lit("")))
    return (
        transcripts.withColumn("_ctx", F.collect_list(line).over(w))
        .filter(
            (F.col("role") == assistant_role) & (F.size("_ctx") >= 1)
        )
        .select(
            "conv_id",
            "turn_idx",
            F.array_join("_ctx", "\n").alias("prompt"),
            F.coalesce("text", F.lit("")).alias("response"),
        )
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile — the curation view a chat-data
    pipeline filters on before extraction: turn counts by role, tool
    usage, size, and (when ts is present) the wall-clock span.  One
    conv-keyed aggregation."""
    cols = set(transcripts.columns)
    aggs = [
        F.count("*").cast("int").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("int")).alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("int")).alias(
            "n_assistant"
        ),
        F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls")
        if "tool" in cols
        else F.lit(0).alias("n_tool_calls"),
        F.sum(F.length(F.coalesce("text", F.lit("")))).alias("n_chars"),
    ]
    if "ts" in cols:
        aggs.append(
            (F.unix_timestamp(F.max("ts"))
             - F.unix_timestamp(F.min("ts"))).alias("span_seconds")
        )
    return transcripts.groupBy("conv_id").agg(*aggs)


def conv_fingerprints(transcripts: DataFrame) -> DataFrame:
    """(conv_id, fp) — md5 of the conversation's turn texts in turn
    order (0x1e record separator, null text as '').  The
    conversation-grain exact-dup key; deterministic via the sorted
    collect fold (same discipline as the engine's score folds)."""
    return transcripts.groupBy("conv_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                "turn_idx",
                                F.coalesce("text", F.lit("")).alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                "\x1e",
            )
        ).alias("fp")
    )


def conv_exact_dups(transcripts: DataFrame) -> DataFrame:
    """Conversation-level exact duplicates: (conv_id, keeper) for every
    conversation whose full turn-text sequence equals another's —
    keeper = the group's minimum conv_id, dup rows only (the
    document-grain exact_dup_groups convention).  One fingerprint
    aggregation + one fp-keyed min join — hash-groupBy shape, scales
    like exact dedup."""
    fps = conv_fingerprints(transcripts)
    keepers = fps.groupBy("fp").agg(F.min("conv_id").alias("keeper"))
    return (
        fps.join(keepers, "fp")
        .filter(F.col("conv_id") != F.col("keeper"))
        .select("conv_id", "keeper")
    )


def conv_rolled_text(transcripts: DataFrame) -> DataFrame:
    """(conv_id, text) — the conversation's turn texts joined in turn
    order (single space; null text as '').  The conversation-grain
    document view the doc-grain dedup/quality family composes over;
    same sorted-fold determinism as conv_fingerprints."""
    return transcripts.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "turn_idx",
                            F.coalesce("text", F.lit("")).alias("t"),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("text")
    )


def conv_near_dup_pairs(
    transcripts: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Conversation-level MinHash+LSH near-dup candidates —
    (a_conv_id, b_conv_id, est_jaccard): roll each conversation to one
    turn-ordered text (conv_rolled_text) and reuse the gated doc-grain
    banded pipeline (operators/dedup.minhash_lsh_pairs) verbatim, so
    the banding/verification semantics stay single-sourced.  Bucketed
    candidate join, never all-pairs — the same 100 TB shape as the
    document family."""
    from ics_search_engine_spark.operators.dedup import minhash_lsh_pairs

    rolled = conv_rolled_text(transcripts).withColumn(
        "turn_idx", F.lit(0).cast("int")
    )
    return minhash_lsh_pairs(
        rolled, n_hashes=n_hashes, n_bands=n_bands,
        jaccard_threshold=jaccard_threshold,
    ).select("a_conv_id", "b_conv_id", "est_jaccard")
