"""Custom stateful streaming operators via applyInPandasWithState —
the Spark-native form of "arbitrary per-key state", which the
reference could only express as a full re-run of its two-phase
pipeline (no streaming exists there, SURVEY.md section 2.4).

State shape and scale: one small state row per active key, stored in
the state store, evicted by timeout/watermark. The update function
sees Arrow batches per key per micro-batch — never per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Running per-user totals: fold each micro-batch into (count, sum)
    state and emit the updated row."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful running (count, sum) per user over the event stream.

    Each micro-batch updates per-user state and emits the new totals
    (output mode: update). State is two numbers per user — bounded by
    the active-user cardinality, not the stream length.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


try:  # Spark 4.x stateful-processor API (transformWithStateInPandas)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """transformWithStateInPandas form of the running per-user
        totals — the successor API to applyInPandasWithState: typed
        state handles (value/list/map state), timers, and TTL support
        instead of a single opaque state tuple. Kept alongside the
        classic operator so both stateful surfaces are exercised.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """Running per-user totals via the Spark 4 stateful-processor
        API. Same semantics and state bound as running_user_totals.

        NOTE: executing this operator needs a working `google.protobuf`
        (the transformWithState state server speaks protobuf); this
        container ships a broken protobuf, so the operator is the
        documented integration point here — the equivalence test skips
        when protobuf is absent and runs wherever it isn't (same
        treatment as multimodal.decode_real vs the missing codecs).
        """
        return (
            events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RunningTotalsProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover - older Spark without the API
    RunningTotalsProcessor = None  # type: ignore[assignment]
    running_user_totals_tws = None  # type: ignore[assignment]


from .._serde import pickle_by_value as _pbv  # noqa: E402
_pbv(__name__)


EXACT_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
EXACT_STATE_SCHEMA = "n bigint, cents bigint, m bigint"  # m = values folded


def _update_user_totals_exact(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Integer-cents running totals: the hash-gateable form. Values are
    2-decimal currency, so floor(value*100 + 0.5) is an exact integer and the
    state folds with INTEGER addition — batch boundaries and arrival
    order cannot move the result by an ulp (a float accumulator would
    make the emitted totals depend on micro-batch splits)."""
    if state.exists:
        n, cents, m = state.get
    else:
        n, cents, m = 0, 0, 0
    for pdf in batches:
        n += len(pdf)
        # the oracle's SUM skips NULLs while COUNT(*) keeps the row —
        # mirror that: count every row, fold only finite values (a NaN
        # would crash the int64 cast and kill the streaming task), and
        # emit NULL (not 0) while nothing has been folded, exactly as
        # SUM over an all-NULL group is NULL
        vals = pdf["value"].dropna()
        if len(vals):
            # floor(x*100 + 0.5): the engine-portable half-up cents
            # convention (embedding_quantize's), NOT pandas .round()
            # whose half-even would diverge from the oracle's FLOOR on
            # exact .5 cents (3+ decimal inputs)
            cents += int(
                np.floor(vals * 100 + 0.5).astype("int64").sum()
            )
            m += len(vals)
    state.update((n, cents, m))
    yield pd.DataFrame(
        {
            "user_id": pd.array([key[0]], dtype="Int64"),
            "n_events": pd.array([n], dtype="Int64"),
            "total_cents": pd.array(
                [cents if m else None], dtype="Int64"
            ),
        }
    )


def running_user_totals_exact(events: DataFrame) -> DataFrame:
    """Stateful running (count, integer-cents sum) per user — the
    deterministic twin of running_user_totals used by the driver gate."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals_exact,
            outputStructType=EXACT_OUTPUT_SCHEMA,
            stateStructType=EXACT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
