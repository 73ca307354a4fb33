"""Fuzzy-expansion scale bench: per-query cost of the vocabulary SCAN
vs the SymSpell DELETION-INDEX probe at a large synthetic vocabulary.

The deletion index is the 10^8-vocabulary path (operators/fuzzy module
docstring): the scan is linear in the vocabulary per query; the
deletes probe is a pushed-down ``dkey IN`` whose cost tracks the
candidate count.  Both must produce bit-identical expansions (pinned
here on every probe, plus tests/test_fuzzy.py).

Usage: python tools/symspell_bench.py [n_terms] [cpus]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402


class _TermStatsShim:
    """fuzzy_expand/ensure_deletes_dict need only .term_stats and
    .path — a vocabulary-only stand-in avoids building a full packed
    index just to benchmark expansion."""

    def __init__(self, spark, path):
        from ics_search_engine_spark.sources import catalog

        self.path = path
        self.term_stats = catalog.read_table(spark, f"{path}/term_stats")


def main() -> None:
    n_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from ics_search_engine_spark.operators.fuzzy import (
        ensure_deletes_dict,
        fuzzy_expand,
        fuzzy_expand_symspell,
    )
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources import catalog

    spark = get_spark(
        "symspell-bench", master=f"local[{cpus}]",
        shuffle_partitions=8 * cpus,
    )
    root = tempfile.mkdtemp(prefix="symspell_bench_")
    try:
        # deterministic pseudo-word vocabulary: 5-14 lowercase chars
        # derived from md5 of the id -> realistic length mix, unique
        terms = (
            spark.range(n_terms)
            .select(
                F.concat(
                    F.lit("t"),
                    F.substring(
                        F.regexp_replace(
                            F.md5(F.col("id").cast("string")), "[0-9]", ""
                        ), 1, 4 + (F.col("id") % 10).cast("int"),
                    ),
                    F.col("id").cast("string"),
                ).alias("term"),
                (F.col("id") % 997 + 1).cast("long").alias("df"),
            )
        )
        catalog.write_table(
            terms, f"{root}/term_stats", sort_cols=["term"],
            hash_col="term", n_partitions=max(cpus // 2, 4),
        )
        pidx = _TermStatsShim(spark, root)

        t0 = time.time()
        deletes = ensure_deletes_dict(spark, pidx, max_dist=2)
        n_delete_rows = deletes.count()
        build_s = time.time() - t0

        probe_rows = pidx.term_stats.limit(40).collect()
        # misspell every probe: drop one char, swap two others' case
        # region (stay lowercase: drop + duplicate)
        probes = []
        for r in probe_rows[:8]:
            t = r["term"]
            probes.append(t[: len(t) // 2] + t[len(t) // 2 + 1:])

        def timed(fn, *a):
            t0 = time.time()
            out = fn(*a)
            return out, time.time() - t0

        scan_s, sym_s, identical = [], [], True
        for p in probes:
            want, ts = timed(fuzzy_expand, pidx, {p: 1}, 2, 8)
            got, ty = timed(
                fuzzy_expand_symspell, spark, pidx, {p: 1}, 2, 8
            )
            scan_s.append(ts)
            sym_s.append(ty)
            identical = identical and (got == want)

        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        print(json.dumps({
            "metric": "fuzzy expansion p50 per-query seconds",
            "n_terms": n_terms,
            "cpus": cpus,
            "deletes_rows": n_delete_rows,
            "deletes_build_sec": round(build_s, 2),
            "scan_p50_sec": round(med(scan_s), 3),
            "symspell_p50_sec": round(med(sym_s), 3),
            "speedup": round(med(scan_s) / max(med(sym_s), 1e-9), 1),
            "expansions_identical": identical,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
