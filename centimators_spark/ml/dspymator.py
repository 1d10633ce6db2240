"""DSPyMator — LLM-program estimator over DataFrame rows.

Reference (/root/reference/src/centimators/model_estimators/dspymator.py):
rows → signature kwargs → sync or asyncio (Semaphore(max_concurrent))
LLM calls; ``predict`` returns target fields, ``transform`` additionally
returns reasoning/aux fields.

Spark design: ``mapInPandas`` — each partition runs its own asyncio
event loop with a semaphore (the reference's driver-side concurrency
moves inside the task, multiplying by executor parallelism; total
concurrency = executors × max_concurrent, the knob that matters against
a rate-limited API). The program is either a picklable async/sync
callable (kwargs → dict) for deterministic testing, or a dspy
signature + model (import-gated: dspy is not in this container).
"""

from __future__ import annotations

import asyncio
import inspect
from typing import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def make_dspy_program(signature: str, model: str):
    try:
        import dspy  # type: ignore
    except ImportError as e:  # pragma: no cover - dspy not in container
        raise ImportError(
            "DSPyMator(signature=..., model=...) requires the 'dspy' package; "
            "pass a picklable `program` callable instead"
        ) from e
    lm = dspy.LM(model)
    predictor = dspy.Predict(signature)

    def run(**kwargs):
        with dspy.context(lm=lm):
            return dict(predictor(**kwargs))

    return run


class DSPyMator:
    def __init__(
        self,
        program: Callable[..., dict] | None = None,
        *,
        signature: str | None = None,
        model: str | None = None,
        input_fields: Sequence[str] = (),
        output_fields: Sequence[str] = ("answer",),
        max_concurrent: int = 50,
        keep_cols: Sequence[str] | None = None,
    ):
        if program is None and (signature is None or model is None):
            raise ValueError("provide program=, or signature= and model=")
        self.program = program
        self.signature = signature
        self.model = model
        self.input_fields = list(input_fields)
        self.output_fields = list(output_fields)
        self.max_concurrent = max_concurrent
        self.keep_cols = list(keep_cols) if keep_cols else []

    def _make_program(self):
        if self.program is not None:
            return self.program
        return make_dspy_program(self.signature, self.model)

    def fit(self, df: DataFrame, y=None):
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        """Run the program per row; returns keep_cols + output_fields."""
        inputs = self.input_fields or [
            c for c in df.columns if c not in self.keep_cols
        ]
        keep = self.keep_cols
        outs = self.output_fields
        max_concurrent = self.max_concurrent
        make_program = self._make_program

        narrow = df.select(*dict.fromkeys(keep + inputs))
        schema = StructType(
            [narrow.schema[c] for c in keep]
            + [StructField(o, StringType()) for o in outs]
        )

        def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            program = make_program()
            is_async = inspect.iscoroutinefunction(program)

            async def run_batch(rows: list[dict]) -> list[dict]:
                sem = asyncio.Semaphore(max_concurrent)

                async def one(kwargs):
                    async with sem:
                        if is_async:
                            return await program(**kwargs)
                        return await asyncio.to_thread(program, **kwargs)

                return list(await asyncio.gather(*[one(r) for r in rows]))

            for pdf in batches:
                rows = pdf[inputs].to_dict("records")
                results = asyncio.run(run_batch(rows))
                out = {c: pdf[c] for c in keep}
                for o in outs:
                    out[o] = [str(r.get(o)) if r.get(o) is not None else None for r in results]
                yield pd.DataFrame(out)

        return narrow.mapInPandas(run_partition, schema)

    transform = predict
