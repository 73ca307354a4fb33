"""spark-submit entry point: build the packed index (north_rule's
deployment mode — "runs via spark-submit --py-files on multi-executor
clusters").

    python -c "from ics_search_engine_spark.session import package_zip; print(package_zip())"
    spark-submit --py-files /tmp/ics_search_engine_spark_pyfiles.zip \
        tools/submit_build.py <input_parquet_or_table> <out_dir> \
        [--buckets N] [--range-bits B] [--no-positions]

The script itself imports only from the shipped zip (plus pyspark), so
it runs identically on a real cluster where the repo checkout does not
exist on executors.  It prints the build manifest as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="parquet path (or Iceberg table name)")
    ap.add_argument("out_dir")
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--range-bits", type=int, default=16)
    ap.add_argument("--no-positions", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("packed-index-build").getOrCreate()
    # the zip shipped via --py-files is on the driver sys.path already;
    # ship it to executors too if the caller used get_spark it is done,
    # but under plain spark-submit we rely on --py-files semantics.
    from ics_search_engine_spark.operators.build import resumable_build
    from ics_search_engine_spark.sources.catalog import read_table

    transcripts = read_table(spark, args.input)
    manifest = resumable_build(
        spark,
        transcripts,
        args.out_dir,
        n_buckets=args.buckets,
        range_bits=args.range_bits,
        with_positions=not args.no_positions,
        input_desc=args.input,
    )
    json.dump(manifest, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
