"""Audit every gate in queries() for non-atomic output columns.

The driver canonicalizes gate output with a pandas sort; list/map/
binary/struct-typed columns raise ``TypeError: unhashable type`` there
(round-3 `snippets_engine` failure).  This runs each gate function at
sf0.001 only far enough to obtain the result DataFrame's schema and
reports any column whose dataType is not atomic.
"""
import sys
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import types as T  # noqa: E402

from ics_search_engine_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

ATOMIC = (
    T.StringType, T.IntegerType, T.LongType, T.DoubleType, T.FloatType,
    T.BooleanType, T.TimestampType, T.TimestampNTZType, T.DateType,
    T.DecimalType, T.ShortType, T.ByteType,
)


def non_atomic_columns(schema) -> list:
    """(name, type) for every output column the driver's pandas
    canonicalizer cannot sort/hash — the single check this audit (and
    tests/test_gate_contracts.py) applies to every gate."""
    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if not isinstance(f.dataType, ATOMIC)
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audit-gate-schemas")
    bad, errs = [], []
    qs = entry.queries()
    for i, (name, fn) in enumerate(sorted(qs.items())):
        try:
            df = fn(spark, sf_dir)
            nonatomic = non_atomic_columns(df.schema)
            if nonatomic:
                bad.append((name, nonatomic))
                print(f"[{i+1}/{len(qs)}] BAD {name}: {nonatomic}",
                      flush=True)
            else:
                print(f"[{i+1}/{len(qs)}] ok  {name}", flush=True)
        except Exception:
            errs.append(name)
            print(f"[{i+1}/{len(qs)}] ERR {name}", flush=True)
            traceback.print_exc()
    print("\n== NON-ATOMIC OUTPUT COLUMNS ==")
    for name, cols in bad:
        print(f"  {name}: {cols}")
    print(f"== errors: {errs}")
    print(f"== bad: {len(bad)}, errs: {len(errs)}, total: {len(qs)}")


if __name__ == "__main__":
    main()
