"""Plan-shape regression pin (r7 verdict next-round #2).

Each bench headliner's physical plan is reduced to its
exchange/broadcast/generate/scan counts and compared against the
committed docs/PLAN_SHAPES.json. A lost broadcast (dimension join
degrading to a shuffle join) or a new shuffle changes nothing at
fixture scale but multiplies cost at 100 TB — this makes such drift a
CI failure instead of a probe-session discovery.

On a DELIBERATE plan change: review the diff, re-run
`python tools/plan_shapes.py`, and commit the regenerated JSON with the
change that caused it.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

REPO = Path(__file__).resolve().parent.parent
PINNED = REPO / "docs" / "PLAN_SHAPES.json"


def test_headliner_plan_shapes_match_pinned(spark, sf_dir):
    from plan_shapes import compute_shapes

    pinned = json.loads(PINNED.read_text())
    live = compute_shapes(sf_dir)
    assert set(live) == set(pinned), (
        "headliner set changed — regenerate docs/PLAN_SHAPES.json "
        "(python tools/plan_shapes.py) and commit the diff")
    drift = {n: (pinned[n], live[n]) for n in live if live[n] != pinned[n]}
    assert not drift, (
        f"physical plan shape drifted (pinned -> live): {drift}. If "
        f"deliberate, re-run tools/plan_shapes.py and commit the diff; "
        f"if not, a broadcast was lost or a shuffle appeared.")
