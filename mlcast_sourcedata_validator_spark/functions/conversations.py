"""Conversation-granular operators: fingerprinting, whole-conversation
dedup, template-turn detection, prefix containment.

The engine's payload is multi-turn transcripts (BASELINE input_hint:
``conv_id, turn_idx, role, text, tool, ts``), and several of its
highest-value dedup decisions are CONVERSATION-level, not turn- or
document-level:

- the same conversation logged twice (retried export, replayed agent
  run) should dedup as a unit — turn-level hashes can't see it, because
  every individual turn may also legitimately appear elsewhere;
- a conversation that is a strict PREFIX of another (an agent run
  re-logged after more turns were appended) is a containment duplicate;
- a turn text recurring across many distinct conversations (canned
  greeting, template apology, system boilerplate) is the transcript
  analog of boilerplate lines in web text
  (:mod:`.boilerplate` frequent-line removal).

All fingerprints are order-sensitive md5 chains over the window-ordered
turns — the same stable ``(conv_id, turn_idx)`` sort the north_star's
per-turn text-equality invariant uses — built from ``sort_array ∘
collect_list`` per conversation: ONE shuffle on the conversation key,
bounded per-group state (``max_conv_turns`` is suite-enforced), and
deterministic results any engine can replicate (DuckDB oracles compare
exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _ordered_turn_hashes(
    df: DataFrame, conv_col: str, order_cols: list[str], text_col: str
) -> DataFrame:
    """(conv, hashes, n_turns): per-conversation array of per-turn text
    hashes in stable turn order. md5 per turn BEFORE collecting keeps
    the grouped state at 32 B/turn regardless of text size."""
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    rows = F.sort_array(F.collect_list(F.struct(
        *[F.col(c) for c in order_cols], h.alias("h"))))
    return df.groupBy(F.col(conv_col).alias("conv")).agg(
        F.transform(rows, lambda r: r["h"]).alias("hashes"),
        F.count(F.lit(1)).alias("n_turns"),
    )


def conv_fingerprints(
    df: DataFrame,
    conv_col: str,
    order_cols: list[str],
    text_col: str,
) -> DataFrame:
    """(conv, fingerprint, n_turns): order-sensitive conversation
    fingerprint — md5 of the '|'-joined per-turn hashes. Any reorder,
    drop, insert, or text edit changes it; two conversations share a
    fingerprint iff their ordered turn texts are identical."""
    g = _ordered_turn_hashes(df, conv_col, order_cols, text_col)
    return g.select(
        "conv",
        F.md5(F.concat_ws("|", F.col("hashes"))).alias("fingerprint"),
        "n_turns",
    )


def dedup_conversations(
    df: DataFrame,
    conv_col: str,
    order_cols: list[str],
    text_col: str,
) -> DataFrame:
    """Whole-conversation exact dedup: among conversations with the same
    fingerprint keep the one with the minimum conversation key, and
    return ALL TURNS of the survivors (the dedup unit is the
    conversation, so turns never orphan). Two key-shuffles total: the
    fingerprint groupBy and the keeper semi-join back onto the turns."""
    fp = conv_fingerprints(df, conv_col, order_cols, text_col)
    w = Window.partitionBy("fingerprint").orderBy("conv")
    keep = (
        fp.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("conv").alias(conv_col))
    )
    return df.join(keep, conv_col, "left_semi")


def template_turns(
    df: DataFrame,
    conv_col: str,
    text_col: str,
    min_convs: int = 3,
) -> DataFrame:
    """(text_hash, text, n_convs, n_turns): turn texts recurring in at
    least ``min_convs`` DISTINCT conversations — canned/template content
    (the transcript analog of frequent-line boilerplate). ``text`` is
    the minimum matching string (deterministic exemplar). One groupBy on
    the 16-byte text hash; at 10^12 turns the group count is bounded by
    distinct turn texts, and the output by the template set."""
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    return (
        df.select(h.alias("text_hash"), F.col(conv_col).alias("_c"),
                  F.col(text_col).alias("_t"))
        .groupBy("text_hash")
        .agg(F.countDistinct("_c").alias("n_convs"),
             F.count(F.lit(1)).alias("n_turns"),
             F.min("_t").alias("text"))
        .where(F.col("n_convs") >= min_convs)
        .select("text_hash", "text", "n_convs", "n_turns")
    )


def prefix_containment_pairs(
    df: DataFrame,
    conv_col: str,
    order_cols: list[str],
    text_col: str,
    prefix_depth: int = 64,
) -> DataFrame:
    """(short_conv, long_conv, n_short): conversation pairs where the
    ENTIRE short conversation equals the first ``n_short`` turns of the
    long one — the re-logged-agent-run containment duplicate that
    neither turn-level nor whole-fingerprint dedup can see.

    Mechanics: from one conversation agg, (a) conversations of length
    <= ``prefix_depth`` emit their full-conversation hash, (b) every
    conversation emits the chain hash of each of its first
    ``min(n_turns - 1, prefix_depth)`` PROPER prefixes (strictly shorter
    than itself), and the equi-join on (hash, length) yields containment
    pairs. Fanout is bounded by ``prefix_depth`` rows per conversation —
    a knob, not a data-dependent explosion; conversations longer than
    the depth simply cannot be detected as the SHORT side (documented
    contract: containment scanning covers the first ``prefix_depth``
    turns). Identical conversations are NOT pairs here (no proper
    prefix) — whole-conversation dedup owns exact duplicates.
    """
    g = _ordered_turn_hashes(df, conv_col, order_cols, text_col)
    prefix_h = F.md5(F.concat_ws("|", F.slice(
        F.col("hashes"), 1, F.col("k"))))
    shorts = (
        g.where(F.col("n_turns") <= prefix_depth)
        .select(F.col("conv").alias("short_conv"),
                F.md5(F.concat_ws("|", F.col("hashes"))).alias("_h"),
                F.col("n_turns").alias("n_short"))
    )
    longs = (
        # n_turns >= 2 BEFORE the sequence: Spark's sequence(1, 0) is the
        # DESCENDING [1, 0], not empty — a single-turn conversation would
        # emit bogus k=0/k=1 prefixes instead of none
        g.where(F.col("n_turns") >= 2)
        .select("conv", "hashes",
                F.explode(F.sequence(
                    F.lit(1),
                    F.least(F.col("n_turns") - 1, F.lit(prefix_depth)),
                )).alias("k"))
        .select(F.col("conv").alias("long_conv"), F.col("k").alias("n_short"),
                prefix_h.alias("_h"))
    )
    return (
        shorts.join(longs, ["_h", "n_short"])
        .select("short_conv", "long_conv", "n_short")
    )


def dedup_prefix_conversations(
    df: DataFrame,
    conv_col: str,
    order_cols: list[str],
    text_col: str,
    prefix_depth: int = 64,
) -> DataFrame:
    """The action form of :func:`prefix_containment_pairs`: drop every
    conversation that is a strict prefix of another (the longer re-log
    supersedes it) and return the surviving turns. Chains collapse
    transitively in one pass — in a ⊂ b ⊂ c, both a and b pair as
    SHORT sides (a also prefixes c directly), so one anti-join removes
    them. Exact whole-unit duplicates are NOT removed here (run
    :func:`dedup_conversations` first/too — composable by design)."""
    shorts = (
        prefix_containment_pairs(df, conv_col, order_cols, text_col,
                                 prefix_depth)
        .select(F.col("short_conv").alias(conv_col)).distinct()
    )
    return df.join(shorts, conv_col, "left_anti")


def compile_conv_duplicates(spec, suite):
    """Declarative whole-conversation duplicate check. params:
    ``text_col`` (default 'text'), ``max_dup_frac`` (default 0.0 — any
    duplicated conversation flags), ``severity`` ('WARNING' default,
    'FAIL' to gate), ``top_k`` exemplar groups in the detail (default 3).

    Metric: 1 - distinct(fingerprint)/count(conversations) over
    :func:`conv_fingerprints` — the fraction of conversations that are
    an exact whole-unit copy of another. Runs as a DriverCheck with its
    own bounded job (one conversation-key shuffle + a scalar agg), like
    ``hot_keys``/``clustering``: per-conversation state cannot ride the
    fused row-level Observation. Opt-in — not in the perf-pinned base
    suites. The detail names the most-duplicated fingerprints with their
    copy counts and example conversation keys, so the finding routes
    straight to :func:`dedup_conversations`.
    """
    from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
    from ..suite import DriverCheck

    text_col = spec.params.get("text_col", "text")
    max_dup_frac = float(spec.params.get("max_dup_frac", 0.0))
    top_k = int(spec.params.get("top_k", 3))
    severity = spec.params.get("severity", WARNING)
    if severity not in (WARNING, FAIL):
        raise ValueError(f"conv_duplicates severity must be WARNING or "
                         f"FAIL, got {severity!r}")

    def fn(ctx) -> ValidationReport:
        report = ValidationReport()
        fp = conv_fingerprints(
            ctx.df, ctx.suite.conv_col, [ctx.suite.turn_col], text_col)
        row = fp.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("fingerprint").alias("d"),
        ).first()
        if not row["n"]:
            report.add(spec.section, spec.requirement, PASS,
                       "no conversations — trivially duplicate-free")
            return stamp(report, __name__, "compile_conv_duplicates")
        dup_frac = 1.0 - row["d"] / row["n"]
        if dup_frac > max_dup_frac:
            tops = (
                fp.groupBy("fingerprint")
                .agg(F.count(F.lit(1)).alias("copies"),
                     F.min("conv").alias("example"))
                .where(F.col("copies") > 1)
                .orderBy(F.desc("copies"), "fingerprint")
                .limit(top_k).collect()
            )
            ex = ", ".join(f"{t['copies']}x (e.g. conv {t['example']})"
                           for t in tops)
            report.add(
                spec.section, spec.requirement, severity,
                f"{row['n'] - row['d']} of {row['n']} conversations "
                f"({dup_frac:.4%}) are whole-unit copies "
                f"(max_dup_frac={max_dup_frac:.4%}); largest groups: "
                f"{ex} — dedup with conversations.dedup_conversations")
        else:
            report.add(
                spec.section, spec.requirement, PASS,
                f"{row['d']} distinct fingerprints over {row['n']} "
                f"conversations (dup fraction {dup_frac:.4%} <= "
                f"{max_dup_frac:.4%})")
        return stamp(report, __name__, "compile_conv_duplicates")

    return DriverCheck(spec.check_id, fn)
