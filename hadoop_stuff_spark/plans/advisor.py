"""Plan-quality ADVISOR — size-aware guidance the linter cannot give.

`plans/lint.py` pattern-matches the physical plan for structural
anti-patterns (cartesians, row-UDFs, duplicated Arrow chains). This
module reads Catalyst's own SIZE ESTIMATES off the optimized logical
plan and turns them into capacity guidance:

- `join_size_report(df)` — every logical join with both children's
  estimated bytes (the numbers that decide broadcast-vs-shuffle);
  the per-query view of "which shuffle is the expensive one" a 100 TB
  plan review starts from.
- `advise(df)` — findings:
  * ``missed-broadcast``: some join's smaller side fits under
    `spark.sql.autoBroadcastJoinThreshold` yet the physical plan still
    carries shuffle joins and fewer broadcast joins than qualifying
    logical joins — usually stale/absent stats or a disabled threshold;
    at cluster scale the fix (hint or ANALYZE) saves the largest single
    shuffle in the query.
  * ``large-shuffle``: a shuffle join where BOTH sides' estimates
    exceed ``large_bytes`` — not wrong, but the stage to watch (skew,
    spill, AQE coalesce) and the candidate for bucketing
    (`sources/bucketed.py`) if the query repeats.

Estimates are Catalyst's planning-time numbers: without column stats
they derive from file sizes and projections, and AQE may still convert
a shuffle join to broadcast at runtime from EXACT stage metrics — the
advisor therefore reports, it never rewrites. Driver-side cost: a plan
walk, no jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


from hadoop_stuff_spark.catalog import _parse_bytes  # canonical impl


def _walk(node, out: list) -> None:
    out.append(node)
    for i in range(node.children().size()):
        _walk(node.children().apply(i), out)


def join_size_report(df: DataFrame) -> list[dict]:
    """One entry per logical join: node name, join type, and each
    child's Catalyst-estimated size in bytes."""
    opt = df._jdf.queryExecution().optimizedPlan()
    nodes: list = []
    _walk(opt, nodes)
    report = []
    for n in nodes:
        if n.nodeName() != "Join":
            continue
        left = n.children().apply(0)
        right = n.children().apply(1)
        report.append(
            {
                "join_type": str(n.joinType().toString()),
                "left_bytes": int(left.stats().sizeInBytes()),
                "right_bytes": int(right.stats().sizeInBytes()),
            }
        )
    return report


def advise(
    df: DataFrame,
    broadcast_threshold: int | None = None,
    large_bytes: int = 1 << 30,
) -> list[tuple[str, str]]:
    """Size-aware findings for ``df``'s plan (see module docstring)."""
    spark = df.sparkSession
    if broadcast_threshold is None:
        broadcast_threshold = _parse_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        )
    phys = df._jdf.queryExecution().executedPlan().toString()
    n_bhj = phys.count("BroadcastHashJoin")
    n_shuffle_join = phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")

    findings: list[tuple[str, str]] = []
    joins = join_size_report(df)
    broadcastable = [
        j for j in joins
        if 0 < broadcast_threshold
        and min(j["left_bytes"], j["right_bytes"]) <= broadcast_threshold
    ]
    if n_shuffle_join > 0 and len(broadcastable) > n_bhj:
        j = min(broadcastable, key=lambda j: min(j["left_bytes"], j["right_bytes"]))
        findings.append(
            (
                "missed-broadcast",
                f"{len(broadcastable)} join(s) have a side under the "
                f"{broadcast_threshold}B broadcast threshold but only "
                f"{n_bhj} broadcast join(s) planned alongside "
                f"{n_shuffle_join} shuffle join(s); smallest side "
                f"{min(j['left_bytes'], j['right_bytes'])}B — add a "
                "broadcast() hint or refresh stats",
            )
        )
    for j in joins:
        if min(j["left_bytes"], j["right_bytes"]) > large_bytes:
            findings.append(
                (
                    "large-shuffle",
                    f"{j['join_type']} join with both sides large "
                    f"({j['left_bytes']}B x {j['right_bytes']}B) — watch "
                    "for skew/spill; bucket the layout if the query repeats",
                )
            )
    return findings
