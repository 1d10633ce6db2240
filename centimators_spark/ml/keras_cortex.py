"""KerasCortex — LLM-guided architecture search (driver-side loop).

Reference (/root/reference/src/centimators/keras_cortex.py:96-143): loop
n_iterations times — an LLM proposes a new ``build_model`` source,
``exec`` it, clone/fit/score on validation, keep the best.

This is a driver-side control loop around the estimator surface; the
engine's role is only to supply fast data prep + distributed scoring,
which KerasEstimator already provides. Both keras and dspy are
import-gated (neither ships in this container); the loop itself is
implemented so that providing a ``propose`` callable (e.g. a DSPyMator
program) and a keras runtime activates it unchanged.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

from centimators_spark.ml.estimators import KerasEstimator


class KerasCortex:
    def __init__(
        self,
        base_build_source: str,
        feature_names: Sequence[str],
        target: str = "target",
        n_iterations: int = 5,
        propose: Callable[[str, float], str] | None = None,
        scorer: Callable[[DataFrame], float] | None = None,
    ):
        self.base_build_source = base_build_source
        self.feature_names = list(feature_names)
        self.target = target
        self.n_iterations = n_iterations
        self.propose = propose
        self.scorer = scorer
        self.best_source_: str | None = None
        self.best_score_: float | None = None
        self.best_estimator_: KerasEstimator | None = None

    def _build_from_source(self, source: str):
        ns: dict = {}
        exec(source, ns)  # noqa: S102 - reference semantics (keras_cortex.py:116)
        if "build_model" not in ns:
            raise ValueError("proposed source must define build_model()")
        return ns["build_model"]

    def think_loop(self, train: DataFrame, valid: DataFrame) -> "KerasCortex":
        if self.propose is None:
            raise ValueError(
                "KerasCortex needs a propose callable (e.g. a DSPyMator "
                "program); dspy/keras are not installed in this environment"
            )
        source = self.base_build_source
        for _ in range(self.n_iterations):
            est = KerasEstimator(
                self._build_from_source(source),
                self.feature_names,
                self.target,
            )
            est.fit(train)
            score = self.scorer(est.predict(valid)) if self.scorer else 0.0
            if self.best_score_ is None or score > self.best_score_:
                self.best_source_, self.best_score_ = source, score
                self.best_estimator_ = est
            source = self.propose(self.best_source_, self.best_score_)
        return self
