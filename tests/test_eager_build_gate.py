"""The lazy-builder contract, enforced.

Registry builders are pure lazy plan constructors EXCEPT the closed
set in ``registry.EAGER_BUILD_QUERIES`` — builders whose docstrings
document a bounded driver-side scalar (a COUNT, a 1-to-20-row
collect) feeding an adaptive physical choice, the way a cost-based
optimizer consults stats. Every such action breaks the build-is-free
contract a little (plan-inspection tooling pays full job cost), so
the set must stay CLOSED: this gate builds the ENTIRE registry under
an instrumented DataFrame class and asserts the observed eager set
equals the pinned ledger exactly — a new eager action anywhere else,
or a pinned one going lazy without a ledger update, fails here
(VERDICT r9 item 3).

PySpark 4 note: runtime DataFrames are
``pyspark.sql.classic.dataframe.DataFrame``, which OVERRIDES
``collect``/``count`` — patching the ``pyspark.sql.DataFrame`` base
class intercepts nothing (measured: an instrumented sweep via the
base class recorded an empty set against 6 true positives).
"""

from __future__ import annotations

from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame
from pyspark.sql.readwriter import DataFrameWriter

from flink_kakfa_spark.registry import EAGER_BUILD_QUERIES, QUERIES, load_all

# Every ClassicDataFrame method that triggers job execution. take/
# first/head route through collect and are covered transitively, but
# toPandas / toLocalIterator / show / foreach do NOT — a builder
# regressing via one of those must not escape the gate (ADVICE r10).
_DF_ACTIONS = [
    "collect",
    "count",
    "toPandas",
    "toLocalIterator",
    "show",
    "foreach",
    "foreachPartition",
    "tail",
]
# Writer entry points (save + the format shortcuts, which call the JVM
# writer directly rather than routing through save).
_WRITER_ACTIONS = [
    "save",
    "saveAsTable",
    "insertInto",
    "parquet",
    "orc",
    "json",
    "csv",
    "text",
]


def test_eager_build_action_set_is_closed(spark, sf_dir):
    load_all()
    current: list[str | None] = [None]
    observed: dict[str, set[str]] = {}

    def instrumented(kind, orig):
        def patched(self, *args, **kwargs):
            if current[0] is not None:
                observed.setdefault(current[0], set()).add(kind)
            return orig(self, *args, **kwargs)

        return patched

    originals: list[tuple[type, str, object]] = []
    for cls, methods in ((ClassicDataFrame, _DF_ACTIONS), (DataFrameWriter, _WRITER_ACTIONS)):
        for m in methods:
            orig = getattr(cls, m)
            originals.append((cls, m, orig))
            setattr(cls, m, instrumented(f"{cls.__name__}.{m}", orig))
    errors: dict[str, str] = {}
    try:
        for name, fn in QUERIES.items():
            current[0] = name
            try:
                fn(spark, sf_dir)  # build only — the plan is never executed
            except Exception as exc:  # pragma: no cover - failure path
                errors[name] = repr(exc)[:120]
            current[0] = None
    finally:
        for cls, m, orig in originals:
            setattr(cls, m, orig)
    assert not errors, f"builders failed at sf0.001: {errors}"
    assert set(observed) == EAGER_BUILD_QUERIES, (
        "eager-at-build set drifted. "
        f"undeclared: {sorted(set(observed) - EAGER_BUILD_QUERIES)}; "
        f"stale ledger entries: {sorted(EAGER_BUILD_QUERIES - set(observed))}. "
        "If the change is deliberate, update registry.EAGER_BUILD_QUERIES "
        "and the query docstring together."
    )
