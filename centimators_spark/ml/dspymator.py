"""DSPyMator — LLM-program estimator over DataFrame rows.

Reference (/root/reference/src/centimators/model_estimators/dspymator.py):
a dspy.Module + signature becomes a sklearn estimator. Field routing
(`dspymator.py:171-196,445-504`): the program's *signature* declares
ordered input fields and output fields; ``feature_names`` maps dataframe
columns positionally onto the input fields (`:361-371`); ``predict``
returns ONLY the ``target_names`` fields (`:445-483`) while
``transform`` returns EVERY output field, including reasoning /
intermediate steps (`:485-504`); ``fit`` must run first and infers
``feature_names`` from the columns when unset (`:253-266`), raising when
the count mismatches the signature (`:267-271`); an optional dspy
optimizer compiles the program against train/validation examples
(`:273-318`).

Spark design: ``mapInPandas`` — each partition runs its own asyncio
event loop with a semaphore (the reference's driver-side
``Semaphore(max_concurrent)`` at `:394-417` moves inside the task,
multiplying by executor parallelism; total concurrency = executors ×
max_concurrent, the knob that matters against a rate-limited API). The
reference's nest_asyncio handling (`:419-442`) is unnecessary here:
executor workers never hold a running event loop. Programs are either

- a **picklable program object** exposing ``signature`` (or
  ``predict.signature``) with ``input_fields`` / ``output_fields`` and a
  ``__call__``/``acall`` returning a dict or attribute record — see
  :class:`FunctionProgram` for wrapping a plain callable; or
- a **dspy module** (import-gated: dspy is not in this container),
  reconstructed per-executor from ``signature=``/``model=`` strings so
  nothing unpicklable crosses the driver→executor boundary.

One deliberate API divergence, same as the rest of the engine: results
in Spark have no row order, so ``keep_cols`` names passthrough columns
(ids) that ride along with the outputs for joining — the reference
returns positionally-aligned frames instead.
"""

from __future__ import annotations

import asyncio
import inspect
from dataclasses import dataclass, field
from typing import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


@dataclass(frozen=True)
class Signature:
    """Ordered input/output field names — the picklable mirror of a
    dspy signature's ``input_fields`` / ``output_fields`` keys."""

    input_fields: tuple[str, ...]
    output_fields: tuple[str, ...]


@dataclass
class FunctionProgram:
    """Wrap a plain (a)sync callable ``**kwargs -> dict`` as a program
    with a declared signature, picklable for executor shipping."""

    fn: Callable[..., dict]
    signature: Signature = field(
        default_factory=lambda: Signature(("question",), ("answer",))
    )

    def __call__(self, **kwargs) -> dict:
        return self.fn(**kwargs)

    async def acall(self, **kwargs) -> dict:
        if inspect.iscoroutinefunction(self.fn):
            return await self.fn(**kwargs)
        return await asyncio.to_thread(self.fn, **kwargs)


def _arith_fn(qty: str, cents: str) -> dict:
    if qty is None or cents is None:  # degenerate rows -> null answer
        return {"answer": None, "workings": None}
    q, c = int(qty), int(cents)
    return {"answer": str(q * 7 + c % 97), "workings": f"7*{q}+{c}%97"}


def arithmetic_demo_program() -> FunctionProgram:
    """Deterministic pure-integer-arithmetic program used by the driver
    contract query: exercises the REAL inference path — signature field
    routing, mapInPandas, per-partition asyncio semaphore — with an
    output that DuckDB can bit-mirror (`answer = 7·qty + cents mod 97`
    as a string). The reference's LLM programs are swapped for this the
    same way its tests stub dspy (reference
    tests/test_dspymator.py-style determinism); the Spark plumbing is
    identical to a real dspy module's."""
    return FunctionProgram(
        _arith_fn, Signature(("qty", "cents"), ("answer", "workings"))
    )


def _get_signature(program):
    """Reference `_get_signature` (`dspymator.py:180-196`):
    ChainOfThought-style modules nest it at .predict.signature."""
    if hasattr(program, "predict") and hasattr(program.predict, "signature"):
        return program.predict.signature
    if hasattr(program, "signature"):
        return program.signature
    raise ValueError(
        f"Cannot extract signature from program of type {type(program)}. "
        "Expected .predict.signature or .signature."
    )


def _field_names(fields) -> list[str]:
    """dspy signatures expose dict-like field maps; Signature exposes
    tuples — accept both."""
    return list(fields.keys()) if hasattr(fields, "keys") else list(fields)


def _get(record, name):
    """Program results may be attribute records (dspy Prediction) or
    plain dicts."""
    if isinstance(record, dict):
        return record.get(name)
    return getattr(record, name, None)


def make_dspy_program(signature: str, model: str):
    """Executor-side factory for the gated dspy path (nothing
    unpicklable is closed over; dspy state is built per worker)."""
    try:
        import dspy  # type: ignore
    except ImportError as e:  # pragma: no cover - dspy not in container
        raise ImportError(
            "DSPyMator(signature=..., model=...) requires the 'dspy' package; "
            "pass a picklable `program` object instead"
        ) from e
    lm = dspy.LM(model)
    predictor = dspy.Predict(signature)

    class _Ctx:
        signature = predictor.signature

        def __call__(self, **kwargs):
            with dspy.context(lm=lm):
                return predictor(**kwargs)

        async def acall(self, **kwargs):
            with dspy.context(lm=lm):
                return await predictor.acall(**kwargs)

    return _Ctx()


class DSPyMator:
    """Sklearn-shaped LLM estimator over Spark rows (see module doc).

    Parameters mirror the reference (`dspymator.py:225-235`):
    ``program`` + ``target_names`` are the core; ``feature_names`` maps
    columns onto signature input fields positionally (default: inferred
    at fit). ``input_fields``/``output_fields`` are a convenience for
    passing a bare callable — they build a :class:`FunctionProgram`.
    """

    def __init__(
        self,
        program=None,
        target_names: str | Sequence[str] = ("answer",),
        *,
        feature_names: Sequence[str] | None = None,
        signature: str | None = None,
        model: str | None = None,
        input_fields: Sequence[str] | None = None,
        output_fields: Sequence[str] | None = None,
        use_async: bool = True,
        max_concurrent: int = 50,
        keep_cols: Sequence[str] | None = None,
    ):
        if program is None and (signature is None or model is None):
            raise ValueError("provide program=, or signature= and model=")
        if program is not None and callable(program) and input_fields is not None:
            program = FunctionProgram(
                program,
                Signature(
                    tuple(input_fields), tuple(output_fields or ("answer",))
                ),
            )
        self.program = program
        self.dspy_signature = signature
        self.model = model
        self.target_names = target_names
        self.feature_names = list(feature_names) if feature_names else None
        self.use_async = use_async
        self.max_concurrent = max_concurrent
        self.keep_cols = list(keep_cols) if keep_cols else []
        t = [target_names] if isinstance(target_names, str) else list(target_names)
        if not t:
            raise ValueError("target_names must contain at least one field.")
        self._target_names = t

    # -- fit --------------------------------------------------------------

    def _signature(self):
        if self.program is not None:
            return _get_signature(self.program)
        # gated path: build once on the driver just for field names
        return _get_signature(make_dspy_program(self.dspy_signature, self.model))

    def fit(self, df: DataFrame, y=None, optimizer=None, validation_data=None):
        """Resolve the column→input-field mapping; optionally compile
        the program with a dspy optimizer (gated)."""
        sig = self._signature()
        self.input_fields_ = _field_names(sig.input_fields)
        if self.feature_names is None:
            self.feature_names = [
                c for c in df.columns if c not in self.keep_cols
            ]
        if len(self.feature_names) != len(self.input_fields_):
            raise ValueError(
                f"Number of feature_names ({len(self.feature_names)}) must "
                f"match number of input_fields ({len(self.input_fields_)})"
            )
        if optimizer is not None:
            self._optimize(df, optimizer, validation_data)
        self._is_fitted = True
        return self

    def _optimize(self, df: DataFrame, optimizer, validation_data):
        """Reference `fit` optimizer path (`dspymator.py:273-318`):
        rows → dspy Examples, optimizer.compile on the driver. Collects
        the training frame — documented driver-side step, same as the
        reference (training sets are small; inference is distributed)."""
        try:
            import dspy  # type: ignore
        except ImportError as e:  # pragma: no cover - dspy not in container
            raise ImportError(
                "fit(optimizer=...) requires the 'dspy' package"
            ) from e
        pdf = df.toPandas()
        if isinstance(validation_data, float):
            n_val = max(1, int(len(pdf) * validation_data))
            val_pdf, train_pdf = pdf.iloc[:n_val], pdf.iloc[n_val:]
        elif validation_data is None:
            train_pdf, val_pdf = pdf, None
        else:
            train_pdf, val_pdf = pdf, validation_data

        def to_examples(frame):
            exs = []
            for _, row in frame.iterrows():
                kwargs = {
                    inp: row[col]
                    for inp, col in zip(self.input_fields_, self.feature_names)
                }
                for t in self._target_names:
                    if t in frame.columns:
                        kwargs[t] = row[t]
                exs.append(dspy.Example(**kwargs).with_inputs(*self.input_fields_))
            return exs

        self.original_program_ = self.program
        compile_kwargs = {"trainset": to_examples(train_pdf)}
        if val_pdf is not None and not isinstance(val_pdf, pd.DataFrame):
            compile_kwargs["valset"] = val_pdf
        elif val_pdf is not None:
            compile_kwargs["valset"] = to_examples(val_pdf)
        self.program = optimizer.compile(self.program, **compile_kwargs)
        if hasattr(self.program, "detailed_results"):
            self.optimizer_results_ = self.program.detailed_results

    # -- execute ----------------------------------------------------------

    def _run(self, df: DataFrame, out_fields: list[str]) -> DataFrame:
        if not getattr(self, "_is_fitted", False):
            raise ValueError("Estimator not fitted. Call fit() first.")
        keep = self.keep_cols
        feature_names = self.feature_names
        input_fields = self.input_fields_
        max_concurrent = self.max_concurrent
        use_async = self.use_async
        program = self.program
        sig_str, model = self.dspy_signature, self.model

        narrow = df.select(*dict.fromkeys(keep + feature_names))
        schema = StructType(
            [narrow.schema[c] for c in keep]
            + [StructField(o, StringType()) for o in out_fields]
        )

        def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            prog = program if program is not None else make_dspy_program(sig_str, model)
            has_acall = hasattr(prog, "acall")

            async def run_batch(rows: list[dict]) -> list:
                sem = asyncio.Semaphore(max_concurrent)

                async def one(kwargs):
                    async with sem:
                        if has_acall:
                            return await prog.acall(**kwargs)
                        return await asyncio.to_thread(prog, **kwargs)

                return list(await asyncio.gather(*[one(r) for r in rows]))

            for pdf in batches:
                rows = [
                    {
                        inp: row[col]
                        for inp, col in zip(input_fields, feature_names)
                    }
                    for _, row in pdf[feature_names].iterrows()
                ]
                if use_async:
                    results = asyncio.run(run_batch(rows))
                else:
                    results = [prog(**r) for r in rows]
                out = {c: pdf[c] for c in keep}
                for o in out_fields:
                    out[o] = [
                        str(v) if (v := _get(r, o)) is not None else None
                        for r in results
                    ]
                yield pd.DataFrame(out)

        return narrow.mapInPandas(run_partition, schema)

    def predict(self, df: DataFrame) -> DataFrame:
        """keep_cols + the target fields only (`dspymator.py:445-483`)."""
        return self._run(df, self._target_names)

    def transform(self, df: DataFrame) -> DataFrame:
        """keep_cols + EVERY signature output field, including reasoning
        (`dspymator.py:485-504`)."""
        return self._run(df, self.get_feature_names_out())

    def fit_transform(self, df: DataFrame, y=None, **kwargs):
        return self.fit(df, y, **kwargs).transform(df)

    def get_feature_names_out(self, input_features=None) -> list[str]:
        return _field_names(self._signature().output_fields)

    def __sklearn_is_fitted__(self) -> bool:
        return getattr(self, "_is_fitted", False)
