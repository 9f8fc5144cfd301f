"""Snapshot diffing: what changed between two versions of a table.

The corpus-ops complement of the drift checks: drift says the
DISTRIBUTION moved, ``diff_tables`` says exactly WHICH keyed rows were
added, removed, or modified between snapshot A (e.g. yesterday's
export) and snapshot B — the review artifact for a corpus re-release
and the input to targeted revalidation (validate only changed keys).

Scale shape: one shuffle per side on the key columns (sort-merge full
outer join; Catalyst broadcasts a small side by itself), row content
compared via an md5 over a canonical JSON of the non-key columns —
computed map-side, so the join carries (keys, 16-byte hash) instead of
full-width rows. O(|A| + |B|) with no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def diff_tables(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two snapshots: (keys..., change) with change in
    {'added', 'removed', 'changed'}; unchanged rows are dropped.

    'added' = key only in ``b``; 'removed' = only in ``a``; 'changed' =
    key in both with any ``compare_cols`` value differing. NULL-safe on
    BOTH axes: the canonical-JSON hash distinguishes NULL from every
    value, and the join matches NULL key components to each other
    (eqNullSafe), so a NULL-keyed row present unchanged in both
    snapshots reports nothing instead of a phantom removed+added pair.
    ``compare_cols`` defaults to the non-key columns the two snapshots
    share, sorted by name so column order differences don't register.
    """
    if compare_cols is None:
        compare_cols = sorted(
            (set(a.columns) & set(b.columns)) - set(keys)
        )
    if not compare_cols:
        raise ValueError("no comparable columns outside the keys")

    def slim(df: DataFrame, tag: str) -> DataFrame:
        h = F.md5(F.to_json(F.struct(*[F.col(c) for c in compare_cols])))
        return df.select(
            *[F.col(k).alias(f"__k_{tag}_{k}") for k in keys],
            h.alias(f"__h_{tag}"),
        )

    sa, sb = slim(a, "a"), slim(b, "b")
    cond = None
    for k in keys:
        c = F.col(f"__k_a_{k}").eqNullSafe(F.col(f"__k_b_{k}"))
        cond = c if cond is None else (cond & c)
    joined = sa.join(sb, cond, "full_outer")
    change = (
        F.when(F.col("__h_a").isNull(), F.lit("added"))
        .when(F.col("__h_b").isNull(), F.lit("removed"))
        .when(F.col("__h_a") != F.col("__h_b"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *[F.coalesce(F.col(f"__k_a_{k}"), F.col(f"__k_b_{k}")).alias(k)
              for k in keys],
            "change",
        )
    )
