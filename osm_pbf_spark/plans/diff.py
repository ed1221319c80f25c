"""OSM replication-diff application (osmChange semantics).

The reference's ecosystem keeps planet extracts current by applying
minutely/hourly ``.osc`` change files: each change is a
create/modify/delete of an entity at a version. This plan applies a
CHANGES DataFrame to an ENTITIES DataFrame with the osmChange
resolution rule, entirely in joins — the distributed replacement for
osmium apply-changes:

- per entity id, the change with the HIGHEST version wins; on a
  version tie, delete > modify > create (deterministic — replication
  streams can carry a modify and delete of the same version when
  squashed); a still-tied pair (same id/version/action, different
  payloads) resolves by payload hash — deterministic under any
  partitioning, never a row_number coin flip;
- a winning delete removes the entity; a winning create/modify
  replaces it (or inserts it if new);
- untouched entities pass through unchanged.

Plan: one per-id ranking window over the (small) change set + one
left-anti join + one union — the entities table is touched by exactly
one shuffle-free anti join probe side when the change set broadcasts
(minutely diffs are tiny next to the planet). At table scale the same
plan runs as a sort-merge anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apply_diff"]

_ACTION_RANK = {"delete": 2, "modify": 1, "create": 0}


def apply_diff(
    entities: DataFrame,
    changes: DataFrame,
    id_col: str = "id",
    version_col: str = "version",
    action_col: str = "action",
) -> DataFrame:
    """Apply osmChange-style ``changes`` to ``entities``.

    ``changes`` must carry every ``entities`` column plus
    ``version_col`` and ``action_col`` ∈ {create, modify, delete}
    (enforced by a raise_error guard). Returns the updated entity
    table with the entities' columns.

    ``id_col`` identifies ONE entity id space: OSM node/way/relation
    ids overlap, so apply node, way and relation change sets in
    separate calls (or pre-compose a (kind, id) key into ``id_col``) —
    a mixed-kind frame under a bare numeric id would conflate them.
    """
    ecols = entities.columns
    missing = [c for c in ecols + [version_col, action_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes frame missing columns: {missing}")
    act = F.col(action_col)
    changes = changes.where(
        F.when(
            act.isin(*_ACTION_RANK), F.lit(True)
        ).otherwise(
            F.raise_error(
                F.concat(F.lit("apply_diff: unknown action "), act)
            )
        )
    )
    rank = (
        F.when(act == "delete", F.lit(2))
        .when(act == "modify", F.lit(1))
        .otherwise(F.lit(0))
    )
    # final tiebreak: same id/version/action but different payloads
    # (a malformed-but-seen-in-the-wild squash) must pick ONE winner
    # deterministically — hash of every non-key column, not whichever
    # row row_number met first in this run's partitioning
    payload_hash = F.xxhash64(
        F.to_json(
            F.struct(
                *[F.col(c) for c in changes.columns
                  if c not in (id_col, version_col)]
            )
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col(version_col).desc(), rank.desc(), payload_hash.asc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(id_col)
    survivors = entities.join(touched, id_col, "left_anti")
    upserts = latest.where(act != "delete").select(*ecols)
    return survivors.unionByName(upserts)
