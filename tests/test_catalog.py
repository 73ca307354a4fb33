"""Catalog shim: the Iceberg/parquet config flip, mechanically
verified as far as this sandbox allows.

Install attempt record (VERDICT r1 #7): the sandbox has no Iceberg
runtime jar anywhere on disk (`find / -name '*iceberg*'` → nothing)
and no network (`urlopen('https://repo1.maven.org/maven2/')` →
URLError: Name or service not known), so the jar cannot be vendored.
What CAN be verified mechanically:

1. the parquet branch produces the claimed physical layout (hash
   distribution + in-file sorted runs + min/max pushdown);
2. the SAME DataFrameWriterV2 call chain the Iceberg branch uses
   (`df.writeTo(name).using(provider).createOrReplace()`) executes end
   to end against the session catalog with the parquet provider — only
   the provider string differs from the Iceberg branch;
3. the Iceberg branch reaches Spark's catalog/provider resolution and
   fails THERE (not in our Python) when the runtime is absent.
"""

import pyarrow.parquet as pq
import pytest

import pyspark.sql.functions as F

from ics_search_engine_spark.sources import catalog


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.range(0, 1000).select(
        F.concat(F.lit("t"), F.col("id") % 37).alias("term"),
        F.col("id").alias("doc_ord"),
    )


def test_iceberg_probe_is_honest(spark):
    """iceberg_available must report the actual classpath state — in
    this sandbox, absent (see module docstring for the install log)."""
    assert catalog.iceberg_available(spark) is False


def test_parquet_branch_layout(spark, tdf, tmp_path):
    """write_table(sort_cols, hash_col) must deliver in-file sorted
    runs (each parquet file internally ordered by term) and row-group
    min/max point-lookup pushdown."""
    out = str(tmp_path / "tbl")
    catalog.write_table(tdf, out, sort_cols=["term"], hash_col="term",
                        n_partitions=4)
    back = catalog.read_table(spark, out)
    assert back.count() == 1000

    import glob

    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 4
    for f in files:
        terms = pq.read_table(f, columns=["term"]).column("term").to_pylist()
        assert terms == sorted(terms), f
    # same term never splits across files (hash distribution)
    seen: dict[str, str] = {}
    for f in files:
        for t in set(pq.read_table(f, columns=["term"]).column("term").to_pylist()):
            assert seen.setdefault(t, f) == f, t

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("term") == "t5").explain()
    assert "PushedFilters: [IsNotNull(term), EqualTo(term,t5)]" in buf.getvalue()


def test_writer_v2_surface_with_session_catalog(spark, tdf):
    """The exact writeTo(...).using(...).createOrReplace() chain the
    Iceberg branch issues, executed for real via the session catalog's
    parquet provider — proves our V2-writer plumbing is valid API use,
    not just a string we never run."""
    spark.sql("DROP TABLE IF EXISTS catalog_shim_probe")
    try:
        # create(): the V1 session catalog supports CTAS but not
        # REPLACE TABLE AS SELECT — createOrReplace() is a V2-catalog
        # capability, which is precisely what Iceberg's SparkCatalog
        # adds; the branch under test drops to it only when
        # iceberg_available() is true
        tdf.writeTo("catalog_shim_probe").using("parquet").create()
        back = spark.read.table("catalog_shim_probe")
        assert back.count() == 1000
        assert set(back.columns) == {"term", "doc_ord"}
        # V2 append/replace against a V1 session-catalog table is
        # rejected by Spark ("Cannot write into v1 table") — those
        # verbs need a V2 catalog, which is what the Iceberg runtime
        # registers; the rejection itself proves the chain reaches
        # catalog capability resolution
        with pytest.raises(Exception, match="v1 table"):
            tdf.limit(10).writeTo("catalog_shim_probe").append()
    finally:
        spark.sql("DROP TABLE IF EXISTS catalog_shim_probe")


def test_iceberg_branch_fails_in_catalog_resolution_not_python(
    spark, tdf, monkeypatch
):
    """Force the Iceberg branch: it must construct the V2 write and
    fail inside Spark's provider/catalog resolution (missing runtime),
    never with a Python-side AttributeError/TypeError — evidence the
    config flip is wired correctly and blocked ONLY by the absent
    jar."""
    monkeypatch.setattr(catalog, "iceberg_available", lambda s: True)
    # table-name shape → V2 writeTo chain
    with pytest.raises(Exception) as ei:
        catalog.write_table(tdf, "iceberg_probe_tbl")
    assert not isinstance(ei.value, (AttributeError, TypeError))
    msg = str(ei.value)
    assert any(
        key in msg
        for key in ("iceberg", "Iceberg", "DATA_SOURCE_NOT_FOUND",
                    "Failed to find", "TABLE_OR_VIEW_NOT_FOUND",
                    "CatalogPlugin", "Cannot use")
    ), msg


def test_path_format_is_explicit_not_inferred(
    spark, tdf, monkeypatch, tmp_path
):
    """Path-target format is a whole-stack CONTRACT, not a classpath
    inference: with the runtime 'present' but SPARK_GRAFT_PATH_FORMAT
    unset, engine paths still write parquet (the pyarrow serving tier
    must be able to read them); setting the env flips write AND read to
    the path-based Iceberg surface, failing in DataSource resolution
    for 'iceberg' (runtime truly absent here), never in our Python."""
    import os

    monkeypatch.setattr(catalog, "iceberg_available", lambda s: True)
    # default: parquet even with the jar present — stack coherence
    p1 = str(tmp_path / "coherent")
    catalog.write_table(tdf, p1, sort_cols=["term"], hash_col="term")
    assert catalog.read_table(spark, p1).count() == 1000
    from ics_search_engine_spark.serving import LocalIndexServer  # noqa: F401

    # explicit opt-in: the path-based Iceberg surface engages
    monkeypatch.setenv(catalog.PATH_FORMAT_ENV, "iceberg")
    for op in (
        lambda: catalog.write_table(
            tdf, str(tmp_path / "ice"), sort_cols=["term"], hash_col="term"
        ),
        lambda: catalog.read_table(spark, str(tmp_path / "ice")),
    ):
        with pytest.raises(Exception) as ei:
            op()
        assert not isinstance(ei.value, (AttributeError, TypeError))
        msg = str(ei.value)
        assert any(
            key in msg
            for key in ("iceberg", "Iceberg", "DATA_SOURCE_NOT_FOUND",
                        "Failed to find")
        ), msg
    # and nothing was written by a parquet fallback
    assert not os.path.exists(tmp_path / "ice")


def test_serving_fails_loudly_on_broken_iceberg_layout(tmp_path):
    """The pyarrow serving tier reads Iceberg layouts through the
    metadata layer (tests/test_iceberg_meta.py proves the working
    path); a DAMAGED table — iceberg directory shape but no committed
    metadata — must fail loudly, never fall back to a raw directory
    scan that would read stale/duplicate data files."""
    import os

    from ics_search_engine_spark.serving import LocalIndexServer

    idx = tmp_path / "iceidx"
    os.makedirs(idx / "index" / "data")
    os.makedirs(idx / "index" / "metadata")
    with open(idx / "stats.json", "w") as f:
        f.write("{}")
    with pytest.raises(FileNotFoundError, match="no Iceberg metadata"):
        LocalIndexServer(str(idx))
