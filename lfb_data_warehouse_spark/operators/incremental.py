"""Incremental (anti-join) loading — SURVEY §2.3 J1/J2, §2.9.

The reference's change-detection idiom: new-rows = staged ∖ existing on
the natural key(s), then append (lfb-extract.py:36-47,
wb-extract.py:25-26, aq-extract.py:50-53 with a broadcast hint). The
anti-join makes re-delivery idempotent — at-least-once upsert without a
state store.

Scale notes: when the *existing* key set is small (a dimension),
broadcast it — the anti-join then runs map-side with zero shuffle of the
staged side. When both sides are large, project the existing side to
just its key columns before the join (shuffles keys, not rows); with
storage-level bucketing on the key the shuffle disappears entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_new_rows(
    staged: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    broadcast_existing: bool = False,
) -> DataFrame:
    """Rows of ``staged`` whose key is absent from ``existing``."""
    probe = existing.select(*keys)
    if broadcast_existing:
        probe = F.broadcast(probe)
    return staged.join(probe, on=list(keys), how="left_anti")


def incremental_append(
    staged: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    broadcast_existing: bool = False,
) -> DataFrame:
    """existing ∪ (staged ∖ existing) — idempotent batch upsert."""
    return existing.unionByName(
        incremental_new_rows(staged, existing, keys, broadcast_existing).select(*existing.columns)
    )
