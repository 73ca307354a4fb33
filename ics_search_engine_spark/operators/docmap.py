"""Global doc-ordinal assignment — deterministic, shuffle-scalable.

docID must be a pure function of the data, never a mutable counter
(the reference's global counter, /root/reference/indexer.py:32,76 and
its locked variant multithread_indexer.py:102-104, is the anti-pattern:
non-deterministic under parallelism, breaks resume).  We assign
``doc_ord`` = global rank of (conv_id, turn_idx) in ascending order:

1. ``repartitionByRange(conv_id, turn_idx)`` — range shuffle, so
   partition p's keys all precede partition p+1's;
2. ``sortWithinPartitions`` — local sort, no global sort barrier;
3. collect per-partition COUNTS only (one long per partition — driver
   traffic is O(partitions), never O(rows));
4. ``mapInPandas`` adds ``cumsum(counts)[pid-1] + local_offset``.

A plain ``row_number() OVER (ORDER BY ...)`` would collapse to a single
partition — unusable at 10^12 rows.  The result is independent of the
range-partitioner's sampled boundaries (rank is rank), so doc_ord is
bit-stable across runs and cluster sizes — required for rank-identity
and resume (SURVEY.md §7).

Why mapInPandas here but a JVM window in datapipe._with_global_offset
(which measured ~9× faster for the cumsum stage): the window variant
costs a hash exchange on the range id, which DESTROYS the range
clustering — and this op's output is written as the docmap parquet,
whose doc_ord-contiguous files feed min/max-pruned ``doc_ord IN``
point lookups (segments pushdown resolution).  Keeping the in-place
pass preserves that file layout; the docmap stage is a small, narrow
(keys + dl) slice of the build, so the Python crossing is paid on
~30 B/row once per build.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ics_search_engine_spark.operators.index_build import DOC_KEY


def assign_doc_ordinals(docs: DataFrame, num_partitions: int | None = None
                        ) -> DataFrame:
    """docs: any DataFrame with (conv_id, turn_idx [, extra cols]) unique
    per doc → same columns + ``doc_ord`` long."""
    if num_partitions:
        ranged = docs.repartitionByRange(num_partitions, *DOC_KEY)
    else:
        ranged = docs.repartitionByRange(*DOC_KEY)
    ranged = ranged.sortWithinPartitions(*DOC_KEY)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    # The count pass and the ordinal pass must see the SAME partitioning.
    # RangePartitioner's sampling is seed-deterministic, but pinning
    # removes any re-plan risk (AQE) between the two jobs.  At petabyte
    # scale the resumable build materializes this stage to a staging
    # table instead (operators/build.py).  Eager localCheckpoint, not
    # persist(): persist() registers in the CacheManager for the whole
    # session (a per-call leak); checkpoint blocks free with the frame.
    # Cluster caveat: localCheckpoint truncates lineage — an executor
    # loss between the two jobs fails fast instead of recomputing;
    # acceptable locally, and exactly why the petabyte path stages to
    # a table.
    with_pid = with_pid.localCheckpoint(eager=True)

    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = with_pid.drop("_pid").schema.add("doc_ord", "long")

    def add_ord(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = -1  # unknown until first batch
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if local < 0:
                local = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_ord"] = range(local + seen, local + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    # NB: mapInPandas preserves the within-partition sorted order because
    # batches arrive in partition order and we never reorder rows.
    return with_pid.mapInPandas(add_ord, schema=out_schema)
