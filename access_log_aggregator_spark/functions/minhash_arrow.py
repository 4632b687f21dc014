"""Arrow-vectorized MinHash signatures (numpy inner loop).

The canonical signature formula (functions/xsql.py: 5-char shingles ->
polyhash mod P -> K affine minima) is pure map work, but its Catalyst
rendition is built from higher-order array functions (``transform`` /
``aggregate``), which Spark evaluates INTERPRETED per element — lambda
bodies are excluded from whole-stage codegen. Measured at sf0.1 (5,000
KB-scale docs, local[32]): 1.7 s interpreted vs 0.5 s for this Arrow +
numpy path computing bit-identical values — the one case in this repo
where a pandas UDF beats the built-in expression surface, because the
"built-in" here is not codegen'd either.

Congruences that make the values identical (all proven by the parity
tests and the DuckDB-oracled registry row):

- code points: Spark 4 string functions and ``split(text, '')`` +
  ``ascii`` operate per Unicode code point (verified incl. astral
  plane), exactly ``numpy.frombuffer(text.encode('utf-32-le'))``;
- the shingle hash is the weighted char-code sum mod P, congruent to
  the stepwise ``(acc*31+c) % P`` fold — intermediates stay < 2^63
  (max code point 0x10FFFF * 31^4 * 5 ~ 5e12);
- duplicate shingles never change a minimum, so no ``distinct``;
- ``(a*h+b) % P`` with a <= 19, h < P ~ 1e9 stays < 2^63 in int64.

Scale shape: embarrassingly parallel map over Arrow batches; the UDF
emits ONLY the K-element signature array (never re-materializing the
text), so the downstream LSH band join consumes narrow rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from . import xsql as x

_SHINGLE = 5
_W = np.array([31 ** (_SHINGLE - 1 - k) for k in range(_SHINGLE)], dtype=np.int64)
_A = np.array([a for a, _ in x.MINHASH_COEFFS], dtype=np.int64).reshape(-1, 1)
_B = np.array([b for _, b in x.MINHASH_COEFFS], dtype=np.int64).reshape(-1, 1)


def _signature(t: str | None) -> list[int] | None:
    """K minhash values for one text; None when no 5-char shingle exists
    (the canonical NULL)."""
    if t is None or len(t) < _SHINGLE:
        return None
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    m = codes.shape[0] - (_SHINGLE - 1)
    h = sum(codes[k:k + m] * _W[k] for k in range(_SHINGLE)) % x.P
    return ((_A * h + _B) % x.P).min(axis=1).tolist()


@F.pandas_udf(ArrayType(LongType()))
def _minhash_sig_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([_signature(t) for t in texts], dtype=object)


def minhash_signature(text_col: str) -> Column:
    """Column of K-element minhash signature arrays (NULL when the text has
    no 5-char shingle), bit-identical to the canonical SQL formulation."""
    return _minhash_sig_udf(F.col(text_col))
