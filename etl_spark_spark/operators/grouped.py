"""Grouped-map operators (``applyInPandas``).

For per-group logic that windows/aggregates can't express — model
fits, solver calls, per-entity algorithms — Spark ships each group to
Python as ONE Arrow-backed pandas frame. Contract at scale: group
cardinality bounded (a group must fit in one task's memory), groups
hash-shuffle once on the key, and the Python work is vectorized numpy
per group, not per row.

``fit_group_trend`` is the template instance: an OLS slope/intercept
per key over (x, y) pairs — e.g. per-user value drift over event time.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def fit_group_trend(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key least-squares fit of y on x.

    Returns one row per key: (keys..., n, slope, intercept). x is
    centered per group before the solve for numerical stability (event
    timestamps are ~1e15 µs). Groups with a degenerate x (single point
    or zero variance) yield NULL slope/intercept.
    """
    import numpy as np

    keys = list(keys)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    out_schema = f"{key_schema}, n long, slope double, intercept double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["n"] = [len(pdf)]
        xc = x - x.mean()
        denom = float((xc * xc).sum())
        if len(pdf) < 2 or denom == 0.0:
            row["slope"] = [None]
            row["intercept"] = [None]
        else:
            slope = float((xc * y).sum()) / denom
            row["slope"] = [slope]
            row["intercept"] = [float(y.mean()) - slope * float(x.mean())]
        return pd.DataFrame(row)

    return df.select(*keys, x_col, y_col).groupBy(*keys).applyInPandas(
        fit, schema=out_schema
    )
