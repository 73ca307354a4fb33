"""Turn-context expansion: each query hit plus its surrounding turns.

The transcript analog of a result snippet.  The reference surfaces a
matched page's title/url as result context (/root/reference/search.py:
204-230, main.py result rendering); for multi-turn conversations the
useful context is the NEIGHBORING TURNS — what was said just before
and after the matching turn.

Scale shape: the anchor side is the top-k result (k rows — tiny), so
it BROADCASTS; the probe side is the transcripts table with the join
keyed on conv_id (hash lookup per row, the turn-range check a residual
predicate), i.e. one scan of transcripts, no shuffle of it, regardless
of corpus size.  With transcripts stored partitioned/sorted by
(conv_id, turn_idx), conv-level min/max statistics additionally skip
row groups containing no anchor conversation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_turn_context(
    results: DataFrame,
    transcripts: DataFrame,
    before: int = 1,
    after: int = 1,
) -> DataFrame:
    """Expand each result row (conv_id, turn_idx[, score...]) with the
    turns in [turn_idx-before, turn_idx+after] of the same conversation
    → (conv_id, turn_idx, ctx_turn_idx, role, text), ordered by
    (conv_id, turn_idx, ctx_turn_idx).

    One output row per (anchor, context turn); overlapping anchor
    windows each keep their own rows (a consumer renders per anchor).
    Conversation edges truncate naturally — no padding rows.
    """
    if before < 0 or after < 0:
        raise ValueError("before/after must be >= 0")
    anchors = results.select("conv_id", "turn_idx").distinct()
    t, r = transcripts.alias("t"), F.broadcast(anchors).alias("r")
    cols = [
        F.col("r.conv_id").alias("conv_id"),
        F.col("r.turn_idx").alias("turn_idx"),
        F.col("t.turn_idx").alias("ctx_turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
    ]
    return (
        t.join(
            r,
            (F.col("t.conv_id") == F.col("r.conv_id"))
            & (F.col("t.turn_idx") >= F.col("r.turn_idx") - before)
            & (F.col("t.turn_idx") <= F.col("r.turn_idx") + after),
        )
        .select(*cols)
        .orderBy("conv_id", "turn_idx", "ctx_turn_idx")
    )
