"""Arrow-vectorized pandas UDFs — the ONLY Python that touches row data
(per BASELINE.json input_hint: "no per-row Python").

Each UDF wraps the pure-Python cores in ``textproc`` so the Spark path
and the single-node oracle share one implementation (stemmer/tokenizer
parity is structural, SURVEY.md §7).

Reference compute being replaced:
* tokenize+stem  -> /root/reference/utils/tokenizer.py:9-34
* simhash        -> /root/reference/utils/simhash.py:32-47
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ics_search_engine_spark.textproc.simhash import simhash_tokens
from ics_search_engine_spark.textproc.tokenizer import tokenize


@pandas_udf(ArrayType(StringType()))
def tokenize_index(texts: pd.Series) -> pd.Series:
    """Index-mode tokens: stemmed, stop words KEPT, len-1 dropped."""
    return texts.map(lambda t: tokenize(t or "", for_query=False))


@pandas_udf(ArrayType(StringType()))
def tokenize_query(texts: pd.Series) -> pd.Series:
    """Query-mode tokens: stop words dropped pre-stem."""
    return texts.map(lambda t: tokenize(t or "", for_query=True))


@pandas_udf(ArrayType(StringType()))
def tokenize_nostem(texts: pd.Series) -> pd.Series:
    """Stem-free index-mode tokens (DuckDB-oracle-compatible variant)."""
    return texts.map(lambda t: tokenize(t or "", for_query=False, do_stem=False))


_SIMHASH_TYPE = StructType(
    [StructField("sim_hi", LongType()), StructField("sim_lo", LongType())]
)


@pandas_udf(_SIMHASH_TYPE)
def simhash128(texts: pd.Series) -> pd.DataFrame:
    """128-bit SimHash as two signed int64s, bit-identical to
    /root/reference/utils/simhash.py:32-47 (see textproc.simhash)."""
    his, los = [], []
    for t in texts:
        hi, lo = simhash_tokens(tokenize(t or "", for_query=False))
        his.append(hi)
        los.append(lo)
    return pd.DataFrame({"sim_hi": his, "sim_lo": los})


@pandas_udf(IntegerType())
def token_count(texts: pd.Series) -> pd.Series:
    """Document length dl — analog of Document.token_count
    (/root/reference/components/document_processor.py:69)."""
    return texts.map(lambda t: len(tokenize(t or "", for_query=False)))
