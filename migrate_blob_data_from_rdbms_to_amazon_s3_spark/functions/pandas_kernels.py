"""Arrow-vectorized Pandas-UDF kernels — the engine's UDF surface
(SURVEY §2 I: the reference has no user-extensible functions; this is the
§7 extension point).

Rules encoded here:
- Pandas UDFs only (Arrow columnar batches; never row-at-a-time Python).
- NumPy-vectorized bodies: one kernel call handles a whole batch.
- Built-ins still win when expressible (the higher-order-function cosine
  in plans/similarity.py is the hot-path choice); the UDF exists for
  kernels built-ins can't express (real model inference, custom scoring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def cosine_to(vec: pd.Series, query: pd.Series) -> pd.Series:
    """Batch cosine similarity between an embedding column and a (constant)
    query vector column. The whole Arrow batch is stacked into one ndarray:
    a single BLAS matrix-vector product per batch, no per-row Python."""
    if vec.empty:
        return pd.Series([], dtype="float64")
    mat = np.stack(vec.to_numpy())            # (n, dim)
    q = np.asarray(query.iloc[0], dtype=np.float64)  # constant per batch
    dots = mat @ q
    norms = np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.Series(np.where(norms > 0, dots / norms, 0.0))


@pandas_udf(DoubleType())
def quality_logit(n_tokens: pd.Series, stopword_ratio: pd.Series,
                  alpha_ratio: pd.Series) -> pd.Series:
    """Example custom scoring kernel: a hand-weighted logistic combination
    of quality features (stand-in for a learned quality model)."""
    z = (
        0.002 * n_tokens.to_numpy(dtype=np.float64)
        + 3.0 * stopword_ratio.to_numpy(dtype=np.float64)
        + 2.0 * alpha_ratio.to_numpy(dtype=np.float64)
        - 2.5
    )
    return pd.Series(1.0 / (1.0 + np.exp(-z)))
