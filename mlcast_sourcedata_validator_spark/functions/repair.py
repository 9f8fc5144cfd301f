"""Canonical repair of mechanically-fixable transcript violations.

``compiler.quarantine`` splits flagged rows OUT; this is the complement
for the violation classes that have one safe, deterministic fix — the
"normalize then revalidate" stage a 10^12-turn ingest runs between a
dirty landing table and the validated store, so recoverable producer
noise (case-mangled roles, stray tool values, replayed rows, deleted
turns) doesn't quarantine whole conversations.

What :func:`repair_transcripts` fixes (and nothing else):

- role spelling: trim + lowercase, ONLY when the result is a declared
  role ("ASSISTANT " -> "assistant"; "operator" stays untouched for the
  domain check to flag — repair must never guess),
- stray tool values: tool := NULL where role != 'tool' (the conditional
  tool check's contract; the value is meaningless there by definition),
- duplicate (conv_id, turn_idx) keys: keep ONE deterministic winner
  (lowest (ts, text-hash) within the key),
- turn_idx gaps: re-contiguize to 0..n-1 in (turn_idx, ts) order —
  a no-op on already-contiguous conversations (row_number-1 == turn_idx).

NOT repairable by construction: NULL text (can't invent payload),
unknown roles/tools on role='tool' rows (can't guess intent), timestamp
regressions (reordering would rewrite history), dangling conv_ids
(a registry fix, not a row fix). Those still flag on revalidation.

Scale shape: the role/tool normalizations are map-side expressions; the
key-dedup and the reindex are two Window operators over the SAME
conv_id hash partitioning, so Catalyst plans ONE Exchange for the whole
repair — the same shuffle budget as the validation suite itself.

Reference analog: the reference only reports (checks/data_vars/
names_and_attrs.py verdicts); repair-then-revalidate is the
pipeline-stage extension, same spirit as quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ROLES = ("system", "user", "assistant", "tool")


def repair_transcripts(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
    tool_col: str = "tool",
    text_col: str = "text",
    roles: tuple[str, ...] = DEFAULT_ROLES,
) -> DataFrame:
    """Apply every mechanical repair (see module docstring); returns a
    DataFrame with the input's columns. Idempotent: repairing the
    output again is a no-op."""
    # 1) role spelling — normalize only INTO the declared alphabet
    norm = F.lower(F.trim(F.col(role_col)))
    fixed_role = F.when(norm.isin(*roles), norm).otherwise(F.col(role_col))
    out = df.withColumn(role_col, fixed_role)
    # 2) stray tool values off role='tool' rows
    out = out.withColumn(
        tool_col,
        F.when(F.col(role_col) == "tool", F.col(tool_col)),
    )
    # 3) duplicate keys: deterministic keep-one. lag over the turn order
    # (ties broken by ts + text hash) marks every repeat of its key;
    # 4) reindex shares the SAME conv partitioning -> one Exchange.
    order = [F.col(turn_col), F.col(ts_col),
             F.xxhash64(F.coalesce(F.col(text_col), F.lit("\x00")))]
    w = Window.partitionBy(conv_col).orderBy(*order)
    out = (
        out.withColumn("_dup", F.col(turn_col).eqNullSafe(
            F.lag(turn_col).over(w)))
        .where(~F.col("_dup"))
        .withColumn(turn_col, F.row_number().over(w) - 1)
        .drop("_dup")
    )
    return out.select(*df.columns)
