"""Batch model inference over feature frames — the plan-level analog
of the reference's ``ctx.get_prediction`` (BentoML model over fetched
features, ``/root/reference/labsdk/raptor/replay.py:178-200``).

Spark-first shape: the model runs inside ``mapInPandas`` — loaded ONCE
per executor python worker (module-level cache), applied to Arrow
batches, never per row. Real model runtimes (torch/onnx/sklearn) are
not in this container, so the default scorer is a deterministic linear
model; the loading/caching/batching plumbing is exactly what a real
model uses (swap ``make_scorer``).
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame

# per-worker model cache: survives across batches/tasks in one python
# worker process — the "load once per executor" pattern
_MODEL_CACHE: dict[str, object] = {}


def linear_model(weights: Sequence[float], bias: float = 0.0):
    def score(batch: pd.DataFrame) -> pd.Series:
        s = pd.Series(bias, index=batch.index, dtype="float64")
        for w, c in zip(weights, batch.columns):
            s = s + w * batch[c].fillna(0.0).astype("float64")
        return s

    return score


def predict(
    features: DataFrame,
    feature_cols: Sequence[str],
    model_id: str,
    make_scorer: Callable[[], Callable[[pd.DataFrame], pd.Series]],
    output_col: str = "prediction",
) -> DataFrame:
    """Append a model score column computed over ``feature_cols``.

    ``make_scorer`` builds the scorer (loads the model); it runs at
    most once per python worker per ``model_id`` via the module cache.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    cols = list(feature_cols)
    schema = StructType(
        list(features.schema.fields) + [StructField(output_col, DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = _MODEL_CACHE.get(model_id)
        if scorer is None:
            scorer = make_scorer()
            _MODEL_CACHE[model_id] = scorer
        for pdf in batches:
            out = pdf.copy()
            out[output_col] = scorer(pdf[cols]).astype("float64")
            yield out

    return features.mapInPandas(run, schema=schema)
