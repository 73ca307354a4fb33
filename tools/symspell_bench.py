"""Fuzzy-expansion scale bench: vocabulary SCAN vs SymSpell
DELETION-INDEX probe across growing vocabularies.

What it demonstrates: per-query scan cost is LINEAR in the vocabulary
(every term's Levenshtein is computed); the deletes probe is a
pushed-down ``dkey IN`` whose touched-row count tracks the CANDIDATE
set, so its per-query cost stays ~flat as the vocabulary grows.  On
this host both paths sit on the ~0.4 s local-mode job-scheduling floor
at small vocabularies — the signal is the TREND, not a single pair.
Expansions are asserted bit-identical on every probe (plus
tests/test_fuzzy.py).

Usage: python tools/symspell_bench.py [cpus] [vocabs_csv]
Prints one JSON line.
"""

import json
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
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    vocabs = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2 else [500_000, 2_000_000, 8_000_000]
    )

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
    results = []
    for n_terms in vocabs:
        root = tempfile.mkdtemp(prefix=f"symspell_bench_{n_terms}_")
        try:
            terms = (
                spark.range(n_terms)
                .select(
                    F.concat(
                        F.lit("t"),
                        F.substring(
                            F.regexp_replace(
                                F.md5(F.col("id").cast("string")),
                                "[0-9]", "",
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

            probe_rows = pidx.term_stats.limit(8).collect()
            probes = []
            for r in probe_rows:
                t = r["term"]
                probes.append(t[: len(t) // 2] + t[len(t) // 2 + 1:])

            scan_s, sym_s, identical = [], [], True
            for p in probes:
                t0 = time.time()
                want = fuzzy_expand(pidx, {p: 1}, 2, 8)
                scan_s.append(time.time() - t0)
                t0 = time.time()
                got = fuzzy_expand_symspell(spark, pidx, {p: 1}, 2, 8)
                sym_s.append(time.time() - t0)
                identical = identical and (got == want)

            med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
            results.append({
                "n_terms": n_terms,
                "deletes_rows": n_delete_rows,
                "deletes_build_sec": round(build_s, 1),
                "scan_p50_sec": round(med(scan_s), 3),
                "symspell_p50_sec": round(med(sym_s), 3),
                "expansions_identical": identical,
            })
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({
        "metric": "fuzzy expansion p50 per-query seconds by vocabulary",
        "cpus": cpus,
        "series": results,
    }))


if __name__ == "__main__":
    main()
