"""spark-submit entry point: run the prepare_corpus data-prep pipeline
(north_rule's deployment mode — "runs via spark-submit --py-files on
multi-executor clusters").

    python -c "from ics_search_engine_spark.session import package_zip; print(package_zip())"
    spark-submit --py-files /tmp/ics_search_engine_spark_pyfiles.zip \
        tools/submit_prepare.py <input_parquet> <out_dir> \
        [--capacity N] [--min-tokens N] [--langs en,de] \
        [--mix src=parts,...] [--no-scrub] [--no-line-dedup] [--no-report] \\
        [--near-dedup] [--c4-rules] [--substring-dedup-l N] [--domain-cap N]

Writes the packed corpus to ``<out_dir>/packed`` (parquet, partitioned
by nothing — chunk_id is a column, range-clustered by construction)
and the attrition report to ``<out_dir>/report``; prints the report
plus chunk stats as one JSON line.  Imports only from the shipped zip
(plus pyspark), so it runs identically where the repo checkout does
not exist on executors.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="parquet path of (doc_id, text, lang, source) docs")
    ap.add_argument("out_dir")
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--langs", default=None,
                    help="comma-separated whitelist; omit = keep all")
    ap.add_argument("--mix", default=None,
                    help="source=parts pairs, e.g. wiki=5,web=1")
    ap.add_argument("--no-scrub", action="store_true")
    ap.add_argument("--no-line-dedup", action="store_true")
    ap.add_argument("--no-report", action="store_true")
    ap.add_argument("--near-dedup", action="store_true",
                    help="transitive MinHash-LSH near-dedup stage")
    ap.add_argument("--c4-rules", action="store_true",
                    help="C4 line-rule filter stage")
    ap.add_argument("--substring-dedup-l", type=int, default=None,
                    help="exact substring dedup at this l-gram grain")
    ap.add_argument("--domain-cap", type=int, default=None,
                    help="keep at most N docs per source")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("prepare-corpus").getOrCreate()
    from ics_search_engine_spark.operators.datapipe import (
        chunk_stats,
        prepare_corpus,
    )

    mix = None
    if args.mix:
        mix = {
            k: int(v)
            for k, v in (kv.split("=", 1) for kv in args.mix.split(","))
        }
    packed, rep = prepare_corpus(
        spark.read.parquet(args.input),
        capacity=args.capacity,
        min_tokens=args.min_tokens,
        langs=tuple(args.langs.split(",")) if args.langs else None,
        mix_parts=mix,
        scrub=not args.no_scrub,
        line_dedup=not args.no_line_dedup,
        near_dedup=args.near_dedup,
        c4_rules=args.c4_rules,
        substring_dedup_l=args.substring_dedup_l,
        domain_cap=args.domain_cap,
        report=not args.no_report,
    )
    packed = packed.persist()
    packed.write.mode("overwrite").parquet(f"{args.out_dir}/packed")
    out: dict = {"out_dir": args.out_dir, "n_docs_packed": packed.count()}
    cs = (
        chunk_stats(packed, capacity=args.capacity)
        .agg(
            {"chunk_id": "max", "n_tokens": "sum", "fill_r6": "avg"}
        )
        .collect()[0]
    )
    out["n_chunks"] = int(cs["max(chunk_id)"]) + 1 if out["n_docs_packed"] else 0
    out["total_tokens"] = int(cs["sum(n_tokens)"] or 0)
    out["mean_fill"] = round(float(cs["avg(fill_r6)"] or 0.0), 4)
    if rep is not None:
        rep.write.mode("overwrite").parquet(f"{args.out_dir}/report")
        out["report"] = [
            [r["stage_name"], r["n_in"], r["n_kept"]]
            for r in rep.orderBy("stage_idx").collect()
        ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
