"""KerasCortex — LLM-guided architecture search (driver-side loop).

Reference (/root/reference/src/centimators/model_estimators/
keras_cortex.py:81-176): a meta-estimator wrapping a base Keras
estimator — fit a baseline, score it on validation, then loop
``n_iterations`` times: an LLM proposes a modified ``build_model``
source from (current code, performance log, goal); exec it, clone the
base estimator with the new builder, fit, score; keep the best; any
iteration error breaks the loop gracefully (`:139-141`). ``fit`` runs
the whole loop and ``predict`` delegates to the best model
(`:145-176`).

Spark role: the loop is driver-side control; data prep, training-data
assembly, and validation SCORING are the distributed parts —
``KerasEstimator.score`` runs R² as one Arrow-batched scoring pass +
one aggregation. The proposer is either a picklable callable
``(current_code, performance_log, goal) -> source`` (deterministic
testing, any LLM client) or the dspy ChainOfThought used by the
reference (import-gated: dspy is not in this container).
"""

from __future__ import annotations

import copy
from typing import Callable, Sequence

from pyspark.sql import DataFrame

OPTIMIZATION_GOAL = "improve validation metrics (R2)"


def make_dspy_proposer(lm: str, verbose: bool = False):
    """The reference's Think module (keras_cortex.py:44-77): a
    ChainOfThought over (code, log, goal) → modified build_model source.
    Gated on dspy."""
    try:
        import dspy  # type: ignore
    except ImportError as e:  # pragma: no cover - dspy not in container
        raise ImportError(
            "make_dspy_proposer requires the 'dspy' package; pass a "
            "picklable propose callable instead"
        ) from e
    model = dspy.LM(lm)
    think = dspy.ChainOfThought(
        "current_keras_code, performance_log, optimization_goal -> "
        "suggested_keras_code_modification"
    )

    def propose(code: str, log: list, goal: str) -> str:
        with dspy.context(lm=model):
            out = think(
                current_keras_code=code,
                performance_log=str(log),
                optimization_goal=goal,
            )
            if verbose:  # pragma: no cover
                print(out.reasoning)
            return out.suggested_keras_code_modification

    return propose


class KerasCortex:
    """Meta-estimator: iteratively refine a base estimator's
    ``build_model`` via LLM proposals (see module doc)."""

    def __init__(
        self,
        base_estimator=None,
        n_iterations: int = 5,
        propose: Callable[[str, list, str], str] | None = None,
        lm: str | None = None,
        base_build_source: str | None = None,
        verbose: bool = False,
    ):
        self.base_estimator = base_estimator
        self.n_iterations = n_iterations
        self.propose = propose
        self.lm = lm
        self.base_build_source = base_build_source
        self.verbose = verbose

    # -- internals --------------------------------------------------------

    def _proposer(self):
        if self.propose is not None:
            return self.propose
        if self.lm is not None:
            return make_dspy_proposer(self.lm, self.verbose)
        raise ValueError(
            "KerasCortex needs propose= (a callable) or lm= (dspy-gated)"
        )

    def _clone(self, est, build_model=None):
        """Fresh unfitted copy of the base estimator, optionally with a
        replacement builder (the reference's sklearn clone +
        MethodType rebind, keras_cortex.py:123-125)."""
        new = copy.copy(est)
        new.model = None
        if build_model is not None:
            new.build_model = build_model
        return new

    def _current_source(self, est) -> str:
        if self.base_build_source is not None:
            return self.base_build_source
        import inspect

        return inspect.getsource(est.build_model)

    @staticmethod
    def _exec_build(source: str):
        ns: dict = {}
        exec(source, ns)  # noqa: S102 - reference semantics (keras_cortex.py:120)
        if "build_model" not in ns:
            raise ValueError("proposed source must define build_model()")
        return ns["build_model"]

    # -- the loop ---------------------------------------------------------

    def think_loop(
        self,
        base_estimator,
        train: DataFrame,
        validation: DataFrame,
        n_iterations: int | None = None,
        **fit_kwargs,
    ):
        """(best_estimator, performance_log) after the refine loop.
        performance_log is the reference's list of (source, score)."""
        propose = self._proposer()
        baseline = self._clone(base_estimator)
        baseline.fit(train, **fit_kwargs)
        best_metric = baseline.score(validation)
        current_code = self._current_source(base_estimator)
        performance_log: list[tuple[str, float]] = [(current_code, best_metric)]
        best_model, suggestion = baseline, current_code

        for i in range(n_iterations or self.n_iterations):
            try:
                suggestion = propose(
                    suggestion, performance_log, OPTIMIZATION_GOAL
                )
                build_model_fn = self._exec_build(suggestion)
                candidate = self._clone(base_estimator, build_model_fn)
                candidate.fit(train, **fit_kwargs)
                metric = candidate.score(validation)
                performance_log.append((suggestion, metric))
                if metric > best_metric:
                    if self.verbose:  # pragma: no cover
                        print(f"Improvement! {metric:.4f} > {best_metric:.4f}")
                    best_metric, best_model = metric, candidate
            except Exception as e:  # reference: break, keep best so far
                if self.verbose:  # pragma: no cover
                    print("Error during optimization iteration:", e)
                break
        return best_model, performance_log

    # -- sklearn facade ---------------------------------------------------

    def fit(
        self,
        train: DataFrame,
        validation_data: DataFrame | None = None,
        **fit_kwargs,
    ) -> "KerasCortex":
        if self.base_estimator is None:
            raise ValueError("KerasCortex requires base_estimator")
        if validation_data is None:
            raise ValueError("KerasCortex.fit requires validation_data")
        self.best_model_, self.performance_log_ = self.think_loop(
            self.base_estimator, train, validation_data, **fit_kwargs
        )
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        if not hasattr(self, "best_model_"):
            raise ValueError("Estimator not fitted. Call 'fit' first.")
        return self.best_model_.predict(df)
