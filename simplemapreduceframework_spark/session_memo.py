"""Per-SparkSession memoization for operator caches.

Operators memoize expensive session-scoped artifacts (persisted index
frames, trained models) so repeated invocations — bench passes, driver
gates, test suites — reuse one copy. Two keying schemes are WRONG for
DataFrame-holding memos:

- ``applicationId``: shared by ``spark.newSession()`` siblings, so a
  sibling receives a DataFrame bound to another session's catalog and
  state (the round-5 advisor finding on retrieval's batch cache).
- ``id(spark)``: CPython reuses addresses of freed objects, so an app
  that churns sessions can alias a dead session's cache entry onto a
  new session at the recycled address.

A ``WeakKeyDictionary`` keyed on the live session OBJECT fixes both:
entries are unreachable from other sessions by construction, and they
die with the session, so a recycled address can never alias. Memos that
hold only plain values (paths, lists) are immune to both hazards and
may keep simpler keys.
"""

from __future__ import annotations

from typing import Any
from weakref import WeakKeyDictionary

from pyspark.sql import SparkSession

_MEMOS: "WeakKeyDictionary[SparkSession, dict[Any, Any]]" = (
    WeakKeyDictionary()
)


def session_memo(spark: SparkSession) -> dict[Any, Any]:
    """The memo dict owned by this SparkSession (created on first use,
    garbage-collected with the session). Callers namespace their keys,
    e.g. ``("funnel", sf_dir)``."""
    memo = _MEMOS.get(spark)
    if memo is None:
        memo = {}
        _MEMOS[spark] = memo
    return memo
