"""Relational operator library (SURVEY.md §2B).

Each operator is DataFrame-in / DataFrame-out, declarative (Catalyst
optimizes the plan), and deterministic. Nothing here collects to the
driver or loops per-row.
"""

from .asof import asof_join
from .joins import exists_semi, missing_anti, prefix_semi_join
from .merge import merge_outcomes, apply_merge
from .range_join import bucketed_range_join
from .routing import threshold_route
from .skew import salted_join
from .windows import latest_by
from .sync import apply_changeset, full_refresh_sync, snapshot_changeset

__all__ = [
    "asof_join",
    "bucketed_range_join",
    "exists_semi",
    "missing_anti",
    "prefix_semi_join",
    "merge_outcomes",
    "apply_merge",
    "threshold_route",
    "salted_join",
    "latest_by",
    "full_refresh_sync",
    "snapshot_changeset",
    "apply_changeset",
]
