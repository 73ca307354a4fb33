import shutil
import tempfile

import pytest

from ics_search_engine_spark.session import get_spark
from ics_search_engine_spark.sources.transcripts import generate_turns


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir():
    d = tempfile.mkdtemp(prefix="ics_corpus_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def tiny_rows():
    """~200-turn corpus as python rows [(conv_id, turn_idx, text)]."""
    tbl = generate_turns(n_convs=20, seed=42)
    return list(
        zip(
            tbl.column("conv_id").to_pylist(),
            tbl.column("turn_idx").to_pylist(),
            tbl.column("text").to_pylist(),
        )
    )


@pytest.fixture(scope="session")
def small_table():
    """~2k-turn corpus as a pyarrow table (e2e parity scale)."""
    return generate_turns(n_convs=200, seed=42)


@pytest.fixture(scope="session")
def small_rows(small_table):
    return list(
        zip(
            small_table.column("conv_id").to_pylist(),
            small_table.column("turn_idx").to_pylist(),
            small_table.column("text").to_pylist(),
        )
    )


@pytest.fixture(scope="session")
def small_df(spark, small_table, corpus_dir):
    import pyarrow.parquet as pq

    path = f"{corpus_dir}/small.parquet"
    pq.write_table(small_table, path)
    return spark.read.parquet(path)
