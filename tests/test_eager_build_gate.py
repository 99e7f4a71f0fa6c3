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

from flink_kakfa_spark.registry import EAGER_BUILD_QUERIES, QUERIES, load_all


def test_eager_build_action_set_is_closed(spark, sf_dir):
    load_all()
    current: list[str | None] = [None]
    observed: dict[str, set[str]] = {}
    orig_collect = ClassicDataFrame.collect
    orig_count = ClassicDataFrame.count

    def instrumented(kind, orig):
        def patched(self, *args, **kwargs):
            if current[0] is not None:
                observed.setdefault(current[0], set()).add(kind)
            return orig(self, *args, **kwargs)

        return patched

    ClassicDataFrame.collect = instrumented("collect", orig_collect)
    ClassicDataFrame.count = instrumented("count", orig_count)
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
        ClassicDataFrame.collect = orig_collect
        ClassicDataFrame.count = orig_count
    assert not errors, f"builders failed at sf0.001: {errors}"
    assert set(observed) == EAGER_BUILD_QUERIES, (
        "eager-at-build set drifted. "
        f"undeclared: {sorted(set(observed) - EAGER_BUILD_QUERIES)}; "
        f"stale ledger entries: {sorted(EAGER_BUILD_QUERIES - set(observed))}. "
        "If the change is deliberate, update registry.EAGER_BUILD_QUERIES "
        "and the query docstring together."
    )
