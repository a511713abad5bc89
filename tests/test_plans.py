"""Plan-quality gate over every driver query: the physical plans Spark
actually chooses must stay scale-shaped.

Two pathologies are banned outright:

- `CartesianProduct` — a shuffle cross-join; at 100 TB any docs x docs
  (or vectors x vectors) cross appearing in a plan is a design
  regression.  Broadcast nested-loop joins are allowed (small side by
  construction, e.g. ANN query batches) — the check targets the shuffle
  variant specifically.
- `BatchEvalPython` — a row-at-a-time Python UDF node.  Python in this
  engine is Arrow-batched only (`ArrowEvalPython` / `MapInArrow` /
  `FlatMapGroupsInPandas`), and only off the hot scoring path.

Runs at sf0.001 so index construction inside the entries is cheap; the
assertion reads the executed plan string, catching regressions the
row-level correctness gate cannot (a correct-but-cartesian plan passes
check_entry and melts at scale).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.001"

_NAMES = sorted(E.queries())


@pytest.mark.parametrize("name", _NAMES)
def test_plan_has_no_pathologies(spark, name):
    df = E.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan, (
        f"{name}: shuffle cartesian product in physical plan"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in physical plan"
    )
