"""Vectorized grok/regex parse over decoded token spans.

The reference ships opaque byte lines (buffer.go:13-16) and never
parses them; the north rule adds a parse stage. This is the one place
the engine leaves JVM expressions — and it does so via Arrow: the
whole decode+regex path is pyarrow/pandas C-level kernels per batch
(`pc.take` + `pc.binary_join` + pandas `.str.extract`), never
per-row Python.

Scale notes (100 TB):
- the vocabulary is a pure function of the token id (no driver-side
  broadcast, no shuffling a vocab table) — each executor builds it
  once and caches it at module level;
- one pandas UDF computes ALL parsed fields in a single decode pass,
  so token arrays cross the Arrow boundary exactly once;
- batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  (the analog of the reference's 4 MB buffer cap, buffer.go:31-36).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llogtail_spark.functions.grok import compile_grok
from llogtail_spark.generate import LEVEL_NUMS, LEVELS, build_vocab

# "<LEVEL> <component> <msg>" — the shape generate.py emits
DEFAULT_GROK = r"^%{LOGLEVEL:level} %{WORD:component} %{GREEDYDATA:msg}$"
CODE_RX = r"code=(\d+)"

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("level", T.StringType()),
        T.StructField("level_num", T.IntegerType()),
        T.StructField("component", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("msg_ntok", T.IntegerType()),
    ]
)

_LEVEL_NUM = dict(zip(LEVELS, LEVEL_NUMS))

_VOCAB_PA: pa.Array | None = None


def _vocab_pa() -> pa.Array:
    """Executor-local cached vocab as a pyarrow array (zero-copy takes)."""
    global _VOCAB_PA
    if _VOCAB_PA is None:
        _VOCAB_PA = pa.array(build_vocab(), type=pa.string())
    return _VOCAB_PA


def _decode_batch(tokens: pd.Series) -> pa.Array:
    """Series of int32 ndarrays -> pa.StringArray of space-joined words.

    All heavy steps are Arrow C++ kernels: fancy-take of the vocab,
    list reassembly, binary_join.
    """
    arrays = tokens.to_numpy()
    lengths = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=len(arrays))
    offsets = np.zeros(len(arrays) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    flat = (
        np.concatenate(arrays).astype(np.int64, copy=False)
        if len(arrays)
        else np.empty(0, dtype=np.int64)
    )
    words = pc.take(_vocab_pa(), pa.array(flat))
    lists = pa.ListArray.from_arrays(pa.array(offsets), words)
    return pc.binary_join(lists, " ")


@F.pandas_udf(T.StringType())
def detokenize(tokens: pd.Series) -> pd.Series:
    """tokens array<int> -> decoded text (vectorized)."""
    return _decode_batch(tokens).to_pandas()


def make_parse_udf(grok_pattern: str = DEFAULT_GROK):
    """Build the parse UDF for a grok pattern. The regex is compiled
    once per executor process (closure state pickled once per task)."""
    rx = compile_grok(grok_pattern)
    code_rx = CODE_RX

    @F.pandas_udf(PARSED_SCHEMA)
    def parse(tokens: pd.Series) -> pd.DataFrame:
        text = pd.Series(_decode_batch(tokens).to_pandas(), copy=False)
        ext = text.str.extract(rx)  # one C-level regex pass per batch
        level = ext.get("level")
        component = ext.get("component")
        msg = ext.get("msg")
        code = text.str.extract(code_rx)[0].astype("Int32")
        out = pd.DataFrame(
            {
                "level": level,
                "level_num": level.map(_LEVEL_NUM).astype("Int32"),
                "component": component,
                "code": code,
                "msg_ntok": msg.str.count(" ").add(1).fillna(0).astype("Int32"),
            }
        )
        return out

    return parse


def parse_stage(df: DataFrame, grok_pattern: str = DEFAULT_GROK) -> DataFrame:
    """Add parsed fields to a sequences DataFrame in ONE Arrow pass.

    Input:  (doc_id, tokens, n_tok, source, ...)
    Output: input columns + (level, level_num, component, code, msg_ntok)
    """
    parse = make_parse_udf(grok_pattern)
    return df.withColumn("_p", parse(F.col("tokens"))).select("*", "_p.*").drop("_p")
