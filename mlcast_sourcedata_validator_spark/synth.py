"""Deterministic synthetic transcripts generator (FIXTURES.md F1-F4).

Everything is generated *inside Spark* from ``spark.range`` + deterministic
``xxhash64``-derived pseudo-randomness — no driver-side loops, no external
data — so the same code produces the 1k-turn unit fixture and the >=1M-turn
bench table, and would produce the 10^12-turn design-point table on a real
cluster unchanged.

Schema (BASELINE.json input_hint)::

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

Properties:
- conv sizes are head-heavy (Zipf-ish over ranks) so a few hot conv_ids
  carry disproportionate rows — exercises salted repartitioning.
- every field is a pure function of (seed, conv_id, turn_idx) so per-turn
  text equality is checkable across runs (input_hint invariant).
- ts strictly increasing within a conversation.
- first turn role='system' for ~70% of conversations, then a
  user/assistant/tool cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: tiny fixed vocabulary for deterministic "token soup" text
_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data model spark shuffle partition check suite valid "
    "transcript turn role tool the and for with from this that"
).split()

ROLES = ("system", "user", "assistant", "tool")
TOOLS = ("search", "python", "browser", "sql")

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


def _u(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic uniform [0,1) from xxhash64 of (seed, tag, *cols)."""
    h = F.xxhash64(F.lit(seed), F.lit(tag), *cols)
    return (F.pmod(h, F.lit(2**31))).cast("double") / F.lit(float(2**31))


def _h(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic non-negative int64 hash."""
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(tag), *cols), F.lit(2**62))


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 512,
    mean_turns: int = 16,
    n_output_partitions: int | None = None,
) -> DataFrame:
    """Generate a clean transcripts DataFrame (FIXTURES.md F1)."""
    convs = spark.range(n_convs).withColumnRenamed("id", "cid")
    # head-heavy sizes: rank 0 gets ~max_turns, tail gets a lognormal-ish base
    base = (F.exp(_u(seed, "len", F.col("cid")) * 2.2) * (mean_turns / 4)).cast("int")
    zipf_boost = (F.lit(max_turns) / F.pow(F.col("cid") + 1, F.lit(0.85))).cast("int")
    convs = convs.withColumn(
        "n_turns",
        F.greatest(F.lit(1), F.least(F.lit(max_turns), base + zipf_boost)),
    )
    convs = convs.withColumn("conv_id", F.format_string("c%08d", F.col("cid")))
    convs = convs.withColumn(
        "start_s",
        F.lit(_EPOCH_2024)
        + (_u(seed, "start", F.col("cid")) * F.lit(730 * 86400)).cast("long"),
    )
    turns = convs.select(
        "conv_id",
        "cid",
        "start_s",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    # role: first turn 'system' with p=0.7, then cycle user/assistant/tool-ish
    cycle = F.element_at(
        F.array(*[F.lit(r) for r in ("user", "assistant", "user", "assistant", "tool", "assistant")]),
        (F.pmod(F.col("turn_idx"), F.lit(6)) + 1).cast("int"),
    )
    role = F.when(
        (F.col("turn_idx") == 0) & (_u(seed, "sys", F.col("cid")) < 0.7), F.lit("system")
    ).otherwise(cycle)
    turns = turns.withColumn("role", role)

    tool = F.when(
        F.col("role") == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]),
            (F.pmod(_h(seed, "tool", F.col("cid"), F.col("turn_idx")), F.lit(4)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))
    turns = turns.withColumn("tool", tool)

    # text: n_words in [3, 40], word_j = vocab[hash(cid, turn, j) % V]
    n_words = (F.lit(3) + (_u(seed, "nw", F.col("cid"), F.col("turn_idx")) * 37).cast("int"))
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.lit(seed), F.lit("w"), F.col("cid"), F.col("turn_idx"), j),
                    F.lit(len(_VOCAB))) + 1).cast("int"),
        ),
    )
    turns = turns.withColumn("text", F.array_join(words, " "))

    # ts: strictly increasing; delta in [1, 61]s, cumulative over the conv
    delta = (F.pmod(_h(seed, "dt", F.col("cid"), F.col("turn_idx")), F.lit(60)) + 1).cast("long")
    w = W.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(W.unboundedPreceding, 0)
    turns = turns.withColumn("ts_s", F.col("start_s") + F.sum(delta).over(w))
    turns = turns.withColumn("ts", F.timestamp_seconds(F.col("ts_s")))

    out = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    )
    if n_output_partitions:
        out = out.repartition(n_output_partitions, "conv_id")
    return out


def generate_conversations_registry(
    transcripts: DataFrame, seed: int = 42, drop_convs: list[str] | None = None
) -> DataFrame:
    """Registry table for referential integrity (FIXTURES.md F3).

    ``drop_convs`` conv_ids are omitted to create dangling references.
    """
    reg = (
        transcripts.groupBy("conv_id")
        .agg(F.min("ts").alias("started_at"))
        .withColumn(
            "channel",
            F.element_at(
                F.array(F.lit("web"), F.lit("api"), F.lit("mobile")),
                (F.pmod(F.xxhash64(F.lit(seed), F.col("conv_id")), F.lit(3)) + 1).cast("int"),
            ),
        )
    )
    if drop_convs:
        reg = reg.filter(~F.col("conv_id").isin(drop_convs))
    return reg


# ---------------------------------------------------------------------------
# F2: violation injection — exactly K violations per class, disjoint targets.
# Classes are routed by conversation bucket = xxhash64(conv_id) % 100 so the
# target sets never overlap; each injector picks its K rows by a
# deterministic ordering. Returns (dirty_df, expected: dict[class, list]).
# ---------------------------------------------------------------------------

VIOLATION_CLASSES = (
    "dup_key", "bad_role", "bad_tool", "null_text",
    "dangling_conv", "turn_gap", "ts_regress",
)


def _bucket(col: F.Column, seed: int) -> F.Column:
    # one bucket per violation class so the injected target sets are disjoint
    return F.pmod(F.xxhash64(F.lit(seed), F.lit("vbucket"), col), F.lit(len(VIOLATION_CLASSES)))


def inject_violations(
    transcripts: DataFrame, k: int = 7, seed: int = 42
) -> tuple[DataFrame, dict[str, list[tuple[str, int]]]]:
    """Plant exactly ``k`` violations of each class (FIXTURES.md F2).

    Driver collects only the tiny target-key lists (k rows per class), never
    the data. Returns the dirty DataFrame and the expected
    {class: [(conv_id, turn_idx), ...]} map for tests.
    """
    df = transcripts
    b = _bucket(F.col("conv_id"), seed)
    expected: dict[str, list[tuple[str, int]]] = {}

    def pick(cls_idx: int, extra_pred=None, turn: int | None = None) -> list[tuple[str, int]]:
        cand = df.filter(b == cls_idx)
        if extra_pred is not None:
            cand = cand.filter(extra_pred)
        if turn is not None:
            cand = cand.filter(F.col("turn_idx") == turn)
        rows = (
            cand.select("conv_id", "turn_idx")
            .orderBy("conv_id", "turn_idx")
            .limit(k)
            .collect()
        )
        got = [(r.conv_id, r.turn_idx) for r in rows]
        if len(got) < k:
            raise ValueError(f"not enough candidate rows for class index {cls_idx}")
        return got

    def key_in(keys: list[tuple[str, int]]) -> F.Column:
        pairs = F.array(*[F.struct(F.lit(c).alias("c"), F.lit(t).alias("t")) for c, t in keys])
        return F.array_contains(
            pairs, F.struct(F.col("conv_id").alias("c"), F.col("turn_idx").alias("t"))
        )

    # 0: dup_key — re-append k rows verbatim
    expected["dup_key"] = pick(0)
    dup_rows = df.filter(key_in(expected["dup_key"]))
    df = df.unionByName(dup_rows)

    # 1: bad_role — rotate through ('operator', 'ASSISTANT ', ''); exclude
    # role='tool' rows so the tool-presence check is not also tripped
    expected["bad_role"] = pick(1, extra_pred=F.col("role") != "tool")
    bad_roles = ["operator", "ASSISTANT ", ""]
    cond = key_in(expected["bad_role"])
    df = df.withColumn(
        "role",
        F.when(
            cond,
            F.element_at(
                F.array(*[F.lit(x) for x in bad_roles]),
                (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int"),
            ),
        ).otherwise(F.col("role")),
    )

    # 2: bad_tool — set an unknown tool on non-tool rows
    expected["bad_tool"] = pick(2, extra_pred=F.col("role") != "tool")
    df = df.withColumn(
        "tool", F.when(key_in(expected["bad_tool"]), F.lit("hammer")).otherwise(F.col("tool"))
    )

    # 3: null_text
    expected["null_text"] = pick(3)
    df = df.withColumn(
        "text",
        F.when(key_in(expected["null_text"]), F.lit(None).cast("string")).otherwise(F.col("text")),
    )

    # 4: dangling_conv — handled by the registry builder; record conv targets
    dangling = (
        df.filter(b == 4).select("conv_id").distinct().orderBy("conv_id").limit(k).collect()
    )
    if len(dangling) < k:
        raise ValueError("not enough conversations for dangling_conv")
    expected["dangling_conv"] = [(r.conv_id, -1) for r in dangling]

    # 5: turn_gap — delete turn_idx=1 from convs with >=3 turns
    gap_convs = (
        df.filter(b == 5)
        .groupBy("conv_id")
        .agg(F.max("turn_idx").alias("mx"))
        .filter(F.col("mx") >= 2)
        .orderBy("conv_id")
        .limit(k)
        .collect()
    )
    if len(gap_convs) < k:
        raise ValueError("not enough long conversations for turn_gap")
    expected["turn_gap"] = [(r.conv_id, 1) for r in gap_convs]
    df = df.filter(~key_in(expected["turn_gap"]))

    # 6: ts_regress — pull turn 2's ts far before turn 1's
    reg_convs = (
        df.filter(b == 6)
        .groupBy("conv_id")
        .agg(F.max("turn_idx").alias("mx"))
        .filter(F.col("mx") >= 2)
        .orderBy("conv_id")
        .limit(k)
        .collect()
    )
    if len(reg_convs) < k:
        raise ValueError("not enough long conversations for ts_regress")
    expected["ts_regress"] = [(r.conv_id, 2) for r in reg_convs]
    df = df.withColumn(
        "ts",
        F.when(
            key_in(expected["ts_regress"]),
            F.col("ts") - F.expr("INTERVAL 1 HOUR"),
        ).otherwise(F.col("ts")),
    )

    return df, expected


def dangling_conv_ids(expected: dict[str, list[tuple[str, int]]]) -> list[str]:
    return [c for c, _ in expected.get("dangling_conv", [])]
