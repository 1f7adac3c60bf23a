"""CDC change-batch application — Delta ``MERGE INTO`` / "APPLY CHANGES
INTO" semantics as a plain DataFrame composition (no Delta required).

The reference loads facts append-only with left-anti incremental dedup
(etl/load/load_fact.py — new keys only). A warehouse also needs the
mutating half: applying an out-of-order batch of inserts / updates /
deletes to a snapshot. This operator implements the standard semantics:

1. per key, only the change with the highest sequence number wins
   (ties broken deterministically so replays are idempotent);
2. a winning DELETE removes the key from the snapshot;
3. a winning INSERT/UPDATE upserts the change row (full-row image);
4. keys not present in the batch pass through untouched.

Scale shape: the change batch is orders of magnitude smaller than the
snapshot (that is what makes CDC worth doing), so

- the latest-per-key window runs on the BATCH only — never on the
  snapshot;
- the snapshot is touched by exactly one LEFT ANTI join against the
  winning keys, which broadcasts when the batch fits (the common case)
  — the 100 TB snapshot is never shuffled, never windowed;
- the result is the anti-join survivors unioned with the winning
  upsert rows: one map-side pass over the snapshot + one tiny union.

Re-running the same batch yields the same table (idempotent), and two
batches can be applied in sequence order to reach the same state as
one concatenated batch (associative for disjoint key sets; for shared
keys the higher sequence wins either way).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_batch: bool = True,
) -> DataFrame:
    """Apply a CDC batch to ``snapshot`` and return the new table.

    ``changes`` must carry the snapshot's columns (full-row images for
    upserts; delete rows may carry NULLs outside the keys) plus
    ``seq_col`` (change order: version, LSN, commit ts) and ``op_col``
    (``delete_op`` marks deletes; anything else upserts).

    Latest-change-wins per key; Δt ties break on op ('D' sorts after
    upserts, so a delete wins a same-sequence tie — the conservative
    choice) then on a hash of the full row image, so two upserts with
    the same key, sequence, and op still pick the same winner on every
    run/retry (the idempotent-replay guarantee needs a TOTAL order).
    """
    data_cols = snapshot.columns
    missing = [c for c in data_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"change batch lacks snapshot columns: {missing}")

    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        # same-sequence tie: delete beats upsert (conservative)
        F.when(F.col(op_col) == delete_op, F.lit(1)).otherwise(F.lit(0)).desc(),
        F.col(op_col).asc(),
        # full-payload tiebreak: deterministic even for duplicate
        # (key, seq, op) rows with different images. Hash a JSON
        # encoding that KEEPS null fields — Spark's hash functions skip
        # NULL children, so xxhash64(cols...) would collide rows that
        # differ only in which column is NULL. Residual: a 64-bit hash
        # collision between distinct images can still tie (~2^-64/pair).
        F.xxhash64(
            F.to_json(
                F.struct(*[F.col(c) for c in data_cols]),
                {"ignoreNullFields": "false"},
            )
        ).asc(),
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    winning_keys = latest.select(*keys)
    if broadcast_batch:
        winning_keys = F.broadcast(winning_keys)
    untouched = snapshot.join(winning_keys, on=list(keys), how="left_anti")
    upserts = latest.filter(F.col(op_col) != delete_op).select(*data_cols)
    return untouched.unionByName(upserts)
