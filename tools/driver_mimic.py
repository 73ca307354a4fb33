"""Local replica of the driver's correctness gate: run each
__spark_entry__ query on Spark AND its oracle SQL on DuckDB over the
same sf dir; compare row count, sorted column names, and
order-insensitive values.

Usage: python tools/driver_mimic.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def df_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import importlib.util as iu

    spec = iu.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
    mod = iu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from ics_search_engine_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.Error:
            pass

    qs, oracles = mod.queries(), mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name}: rows={len(srows)} (no oracle — rows-only)")
                continue
            dres = con.execute(oracles[name])
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
            sc, sr = df_to_rows(scols, srows)
            dc, dr = df_to_rows(dcols, drows)
            ok_cols = sc == dc
            ok_count = len(sr) == len(dr)
            ok_vals = sr == dr
            status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
            print(f"  {name}: {status} rows={len(sr)}/{len(dr)} cols={sc if not ok_cols else 'match'}")
            if status == "FAIL":
                failures.append(name)
                if not ok_vals and ok_count and ok_cols:
                    diff = [
                        (a, b) for a, b in zip(sr, dr) if a != b
                    ][:3]
                    for a, b in diff:
                        print(f"    spark={a}")
                        print(f"    duck ={b}")
        except Exception as e:
            failures.append(name)
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:300]}")

    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
