"""Pipeline: a column-name-keyed stage DAG with fit/transform lifecycle.

Re-expression of the reference's KamaeSparkPipeline (reference:
src/kamae/spark/pipeline/pipeline.py:36, graph/pipeline_graph.py:92-117)
without the networkx dependency:

- stages are validated/ordered topologically by column-name edges
  (~60 LoC hand-rolled toposort)
- fit applies only stages that are ancestors of a not-yet-fitted
  estimator (reference's one optimizer rule, pipeline.py:100-178)
- transform compiles the transformer chain into BATCHED ``select``s:
  consecutive pure-projection stages whose inputs are already
  materialized fuse into one select, so a 500-stage pipeline produces a
  handful of Project nodes instead of 500 ``withColumn``s (analyzer
  O(n^2) avoidance; Catalyst CollapseProject + whole-stage codegen then
  see one flat projection)
- save/load: one JSON spec per pipeline (stages + params, including
  fitted state such as vocab arrays / means), reference analogue:
  pipeline.py:193-239, pipeline_model.py:62-79
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterable

from pyspark.sql import DataFrame

from kamae_spark.core.stage import Estimator, Stage, Transformer


def _toposort(stages: list[Stage]) -> list[Stage]:
    """Order stages so every stage runs after the producers of its inputs.

    Stable: preserves user order among independent stages. Raises on
    cycles and on duplicate output column names.
    """
    producer: dict[str, int] = {}
    for i, s in enumerate(stages):
        for c in s.output_columns:
            if c in producer:
                raise ValueError(f"duplicate producer for column {c!r}")
            producer[c] = i

    deps: list[set[int]] = [
        {producer[c] for c in s.input_columns if c in producer} for s in stages
    ]
    done: list[int] = []
    state = [0] * len(stages)  # 0 unvisited, 1 in-stack, 2 done

    def visit(i: int) -> None:
        if state[i] == 2:
            return
        if state[i] == 1:
            raise ValueError(f"cycle involving stage {stages[i]!r}")
        state[i] = 1
        for d in sorted(deps[i]):
            visit(d)
        state[i] = 2
        done.append(i)

    for i in range(len(stages)):
        visit(i)
    return [stages[i] for i in done]


def _ancestor_indices(stages: list[Stage], targets: Iterable[int]) -> set[int]:
    """Indices of stages whose outputs (transitively) feed any target stage
    (reference: collect_estimator_parents, pipeline.py:100-133)."""
    producer = {c: i for i, s in enumerate(stages) for c in s.output_columns}
    out: set[int] = set()
    frontier = list(targets)
    while frontier:
        i = frontier.pop()
        for c in stages[i].input_columns:
            p = producer.get(c)
            if p is not None and p not in out:
                out.add(p)
                frontier.append(p)
    return out


def _fused_transform(
    df: DataFrame, transformers: list[Transformer],
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Apply transformers with select-fusion.

    A batch of pending (alias -> Column) exprs is flushed into one
    ``select("*", ...)`` whenever the next stage needs a pending column
    (a select cannot reference an alias defined in the same select) or
    is not expressible as a projection.

    ``checkpoint_every``: lineage-truncation valve for VERY long
    pipelines (hundreds of dependent stages). Every N flushes the plan
    is cut with ``localCheckpoint`` so Catalyst analysis/optimization
    cost stays bounded instead of growing superlinearly with plan depth
    (SURVEY.md §7 risk 4 — the reference hits the same wall through
    thousands of withColumns). Fused selects make this rarely needed;
    leave None unless analysis time is observed to dominate."""
    pending: dict[str, Any] = {}
    flushes = 0

    def flush() -> None:
        nonlocal df, flushes
        if pending:
            df = df.select("*", *[c.alias(n) for n, c in pending.items()])
            pending.clear()
            flushes += 1
            if checkpoint_every and flushes % checkpoint_every == 0:
                df = df.localCheckpoint(eager=False)

    for t in transformers:
        if any(c in pending for c in t.input_columns):
            flush()
        exprs = t.build(df)
        if exprs is None:
            flush()
            df = t.transform(df)
        else:
            pending.update(exprs)
    flush()
    return df


class Pipeline(Stage):
    """Unfitted pipeline: mixed list of Transformers and Estimators."""

    def __init__(self, stages: list[Stage]):
        super().__init__()
        self.stages = self._expand(stages)

    @staticmethod
    def _expand(stages: list[Stage]) -> list[Stage]:
        """Recursively flatten nested pipelines (reference: pipeline.py:83-98)."""
        flat: list[Stage] = []
        for s in stages:
            if isinstance(s, (Pipeline, PipelineModel)):
                flat.extend(s.stages)
            else:
                flat.append(s)
        return flat

    def fit(self, df: DataFrame) -> "PipelineModel":
        stages = _toposort(self.stages)
        est_idx = [i for i, s in enumerate(stages) if isinstance(s, Estimator)]
        ancestors = _ancestor_indices(stages, est_idx)
        needed = set(est_idx) | ancestors  # stages to actually execute during fit

        fitted: list[Transformer] = []
        current = df
        remaining_estimators = len(est_idx)
        for i, s in enumerate(stages):
            if isinstance(s, Estimator):
                model = s.fit(current)
                fitted.append(model)
                remaining_estimators -= 1
                if remaining_estimators and i in ancestors:
                    current = model.transform(current)
            else:
                assert isinstance(s, Transformer)
                fitted.append(s)
                if remaining_estimators and i in needed:
                    current = s.transform(current)
        return PipelineModel(fitted)

    def transform(self, df: DataFrame) -> DataFrame:
        if any(isinstance(s, Estimator) for s in self.stages):
            raise ValueError("pipeline contains unfitted estimators; call fit() first")
        return PipelineModel(list(self.stages)).transform(df)  # type: ignore[arg-type]

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        _save_spec(path, {"type": "Pipeline", "stages": [s.to_spec() for s in self.stages]})

    @classmethod
    def load(cls, path: str) -> "Pipeline":
        spec = _load_spec(path)
        return cls([Stage.from_spec(s) for s in spec["stages"]])


class PipelineModel(Stage):
    """Fitted pipeline: transformers only; transform is select-fused."""

    def __init__(self, stages: list[Transformer]):
        super().__init__()
        self.stages = stages

    def transform(
        self, df: DataFrame, outputs: list[str] | None = None,
        checkpoint_every: int | None = None,
    ) -> DataFrame:
        """Apply all stages; with ``outputs``, dead-stage-eliminate first:
        only stages whose outputs (transitively) feed a requested column
        run (engine-level rule mirroring fit-time estimator-ancestor
        pruning — Catalyst's column pruning cannot remove stages that
        were never needed when later stages shuffle).
        ``checkpoint_every``: see _fused_transform (lineage valve for
        very long pipelines)."""
        stages = _toposort(list(self.stages))
        if outputs is not None:
            targets = [
                i for i, s in enumerate(stages)
                if any(c in outputs for c in s.output_columns)
            ]
            keep = set(targets) | _ancestor_indices(stages, targets)
            stages = [s for i, s in enumerate(stages) if i in keep]
        return _fused_transform(df, stages, checkpoint_every)  # type: ignore[arg-type]

    def save(self, path: str) -> None:
        _save_spec(
            path, {"type": "PipelineModel", "stages": [s.to_spec() for s in self.stages]}
        )

    @classmethod
    def load(cls, path: str) -> "PipelineModel":
        spec = _load_spec(path)
        return cls([Stage.from_spec(s) for s in spec["stages"]])  # type: ignore[list-item]


def _canon_json(v):
    """Canonicalize stage params for the JSON spec: numpy scalars become
    native Python numbers, tuples/sets become lists. Anything else
    non-JSON-native raises at SAVE time — the previous default=str
    silently stringified such params, producing a spec that loads
    without error but reconstructs wrong-typed stages."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple, set)):
        return [_canon_json(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _canon_json(x) for k, x in v.items()}
    item = getattr(v, "item", None)  # numpy scalar -> python scalar
    if callable(item):
        out = item()
        if isinstance(out, (bool, int, float, str)):
            return out
    raise TypeError(
        f"stage param of type {type(v).__name__} is not JSON-serializable; "
        "coerce it to a native Python type before save()"
    )


def _save_spec(path: str, spec: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(_canon_json(spec), f, indent=1)


def _load_spec(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
