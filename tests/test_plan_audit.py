"""Fleet-wide plan sweep as a CI regression net: any NEW query that plans
a CartesianProduct, a BroadcastNestedLoopJoin, or an unpartitioned window
fails here until its docstring justifies the shape and the name joins
tools/plan_audit.py's KNOWN_OK list — the per-case assertions in
test_plan_shape.py pin the load-bearing plans; this catches the ones
nobody thought to pin."""

from __future__ import annotations

from tests.conftest import SF_CORRECT
from tools.plan_audit import _unpartitioned_windows, audit, flags_for


def test_no_unjustified_scale_risk_shapes(spark):
    rows = audit(SF_CORRECT, spark=spark)
    assert len(rows) >= 157
    flagged = [(r["query"], why) for r in rows for why in flags_for(r)]
    assert flagged == [], (
        "queries with undocumented scale-risk plan shapes (justify in the "
        f"docstring, then add to plan_audit.KNOWN_OK): {flagged}"
    )


def test_unpartitioned_window_detector():
    """The regex heuristic: ordering-first specs are unpartitioned,
    partition-first specs are not."""
    unpart = "Window [row_number() windowspecdefinition(x#3L ASC NULLS FIRST, frame) AS rn]"
    part = "Window [row_number() windowspecdefinition(shard#1L, h#2L ASC NULLS FIRST, frame) AS rn]"
    assert _unpartitioned_windows(unpart) == 1
    assert _unpartitioned_windows(part) == 0


def test_known_ok_names_exist():
    """KNOWN_OK must reference live registry names — a renamed query must
    not leave a stale exemption behind (it would silently re-allow the
    shape under the old name while flagging the new one)."""
    from tools.plan_audit import KNOWN_OK
    from warcraider_spark.registry import all_specs

    stale = KNOWN_OK - set(all_specs())
    assert stale == set(), f"stale KNOWN_OK entries: {sorted(stale)}"
