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


def conv_near_dup_drops(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Near-dup pair frame (a_conv_id, b_conv_id, ...) → one-column
    (conv_id) frame of conversations to DROP under the transitive
    keeper rule: build the pair graph, take connected components
    (components.connected_components — large/small-star, O(log² n)
    rounds), keep each component's MINIMUM conv_id, drop the rest.
    This matches the doc-grain prepare_corpus(near_dedup=True)
    semantics exactly: for a chain A~C, B~C (A<B<C) the survivors are
    {A}, not the pairwise-drop {A, B}."""
    from ics_search_engine_spark.operators.components import (
        connected_components,
    )

    cc = connected_components(
        pairs, src="a_conv_id", dst="b_conv_id", max_iter=max_iter
    )
    return cc.filter(F.col("node") != F.col("root")).select(
        F.col("node").alias("conv_id")
    )


def prepare_chat_corpus(
    transcripts: DataFrame,
    min_turns: int = 2,
    max_turns: int | None = None,
    require_assistant: bool = True,
    near_dedup: bool = False,
    jaccard_threshold: float = 0.7,
    context_turns: int = 1,
    report: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """The chat-data composition — conversation curation end-to-end,
    the conversation-grain sibling of datapipe.prepare_corpus:

      1. structural gates  (min/max turn counts; ≥1 assistant turn)
      2. exact dedup       (conv_exact_dups — keep the keeper)
      3. near dedup        (conv_near_dup_pairs → connected
                            components → keep each TRANSITIVE group's
                            minimum conv_id (conv_near_dup_drops) —
                            the same semantics as the doc-grain
                            prepare_corpus(near_dedup=True))
      4. extraction        (sft_pairs over the survivors)

    Returns (pairs, report): ``pairs`` is the SFT example frame;
    ``report`` is (stage, n_convs) attrition accounting (None when
    ``report=False`` — each row costs one count job).  Every stage is
    the individually-gated operator; this function owns only order
    and accounting, the prepare_corpus discipline."""
    spark = transcripts.sparkSession
    stages: list[tuple[str, int]] = []

    stats = conversation_stats(transcripts)
    keep = stats.filter(F.col("n_turns") >= min_turns)
    if max_turns is not None:
        keep = keep.filter(F.col("n_turns") <= max_turns)
    if require_assistant:
        keep = keep.filter(F.col("n_assistant") >= 1)
    cur = transcripts.join(
        keep.select("conv_id"), "conv_id", "left_semi"
    )
    if report:
        stages.append(("input", transcripts.select("conv_id")
                       .distinct().count()))
        stages.append(("structural", keep.count()))

    dups = conv_exact_dups(cur).select("conv_id")
    cur = cur.join(dups, "conv_id", "left_anti")
    if report:
        stages.append(("exact_dedup",
                       cur.select("conv_id").distinct().count()))

    if near_dedup:
        drop = conv_near_dup_drops(
            conv_near_dup_pairs(cur, jaccard_threshold=jaccard_threshold)
        )
        cur = cur.join(drop, "conv_id", "left_anti")
        if report:
            stages.append(("near_dedup",
                           cur.select("conv_id").distinct().count()))

    pairs = sft_pairs(cur, context_turns=context_turns)
    rep = None
    if report:
        rep = spark.createDataFrame(
            [(i, name, n) for i, (name, n) in enumerate(stages)],
            "stage_idx int, stage string, n_convs long",
        )
    return pairs, rep


def trim_to_token_budget(
    transcripts: DataFrame,
    budget: int,
    keep: str = "last",
) -> DataFrame:
    """Context-window trimming: keep each conversation's turns whose
    WHITESPACE-token counts fit in ``budget``, taking turns from the
    END (``keep='last'`` — the chat-serving posture: most recent
    context survives) or the START (``keep='first'`` — the
    pretraining-truncation posture).  Turns are taken whole in the
    chosen direction until the running token sum exceeds the budget;
    the first over-budget turn AND every turn beyond it are dropped
    (never clipped mid-turn — chat examples must stay turn-aligned),
    so the output is always a contiguous suffix (``keep='last'``) or
    prefix (``keep='first'``) of the conversation — the context-window
    shape, not a skip-and-continue subset.

    Output: the input columns + ``n_turn_tokens`` and
    ``conv_tokens_kept``.  One per-conversation window (bounded) for
    the directional running sum."""
    if budget < 1:
        raise ValueError("budget must be positive")
    if keep not in ("last", "first"):
        raise ValueError(f"keep must be 'last' or 'first', got {keep!r}")
    toks = F.size(
        F.filter(
            F.split(F.coalesce("text", F.lit("")), "\\s+"),
            lambda x: F.length(x) > 0,
        )
    )
    order = (
        F.col("turn_idx").desc() if keep == "last"
        else F.col("turn_idx").asc()
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        transcripts.withColumn("n_turn_tokens", toks)
        .withColumn("_run", F.sum("n_turn_tokens").over(w))
        .filter(F.col("_run") <= budget)
    )
    wc = Window.partitionBy("conv_id")
    return (
        out.withColumn(
            "conv_tokens_kept", F.max("_run").over(wc)
        )
        .drop("_run")
    )


def validate_turn_order(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural-validity signals — the malformed-
    transcript screen a chat-data pipeline runs before extraction:

      * ``contiguous``       — turn_idx values are exactly 0..n-1
      * ``alternating``      — no two consecutive turns share a role
      * ``starts_with_user`` — first turn's role is 'user'
      * ``ends_with_assistant`` — last turn's role is 'assistant'
      * ``valid``            — all of the above

    One conv-keyed aggregation over the turn-ordered fold (no window):
    the per-conv turn list is bounded, same discipline as
    conv_fingerprints."""
    rolled = transcripts.groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(F.struct("turn_idx", F.col("role").alias("r")))
        ).alias("ts")
    )
    idxs = F.transform("ts", lambda s: s["turn_idx"])
    roles = F.transform("ts", lambda s: s["r"])
    n = F.size("ts")
    contiguous = idxs == F.sequence(F.lit(0), n - 1)
    neighbor_same = F.exists(
        F.zip_with(
            F.slice(roles, 1, n - 1),
            F.slice(roles, 2, n - 1),
            lambda a, b: a == b,
        ),
        lambda x: x,
    )
    alternating = F.when(n <= 1, F.lit(True)).otherwise(~neighbor_same)
    starts = F.element_at(roles, 1) == "user"
    ends = F.element_at(roles, -1) == "assistant"
    return rolled.select(
        "conv_id",
        n.cast("int").alias("n_turns"),
        contiguous.alias("contiguous"),
        alternating.alias("alternating"),
        starts.alias("starts_with_user"),
        ends.alias("ends_with_assistant"),
        (contiguous & alternating & starts & ends).alias("valid"),
    )
