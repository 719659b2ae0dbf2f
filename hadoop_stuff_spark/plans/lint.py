"""Query-plan linter — SCALE.md's anti-pattern catalog as a programmatic
check over a DataFrame's physical plan.

Every rule here came from a real defect this engine shipped and fixed
(citations in each rule), so the linter is the regression net that keeps
them fixed — `tests/test_planshapes.py` asserts specific plans stay
clean, and any new operator can be gated with one
``assert not lint_plan(df)`` line.

Rules (name → what it catches at 100 TB):
- ``cartesian``           CartesianProduct / BroadcastNestedLoopJoin: O(n·m)
                          compare — fatal on fact-sized inputs. (The one
                          sanctioned site is the exact-oracle baseline in
                          dedup.py, which documents itself.)
- ``python-udf-row``      Non-Arrow row-at-a-time Python UDF (BatchEvalPython):
                          ~10-100× slower than pandas UDFs; nothing in the
                          engine's hot paths may use one.
- ``python-chain-dup``    The SAME ArrowEvalPython chain appearing twice:
                          Catalyst's constraint propagation (e.g. an inferred
                          `size(udf(..)) > 0` from a Generate) can duplicate
                          an expensive UDF pipeline below an Exchange —
                          exactly the round-2 PQ bug (operators/pq.py
                          docstring; fixed by fusing into mapInPandas).
- ``exchange-storm``      More Exchanges than ``max_exchanges`` (default 4):
                          a plan reshuffling that often is usually missing a
                          broadcast hint or re-partitioning per stage.
- ``global-sort``         A global Sort that is not part of
                          TakeOrderedAndProject: at scale a full-data
                          range-exchange+sort; candidate-pair pipelines must
                          gate these behind ``sort=False`` (VERDICT r1 #7).

`lint_plan` returns a list of (rule, evidence) findings — empty means
clean. It inspects the PHYSICAL plan (post-AQE initial plan), so what it
sees is what would run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _op_col(line: str) -> int:
    """Column where the operator name starts (plan-tree depth proxy)."""
    i = 0
    while i < len(line) and line[i] in " :+-*()":
        i += 1
    return i


def _strip_cached_subtrees(plan: str) -> str:
    """Drop every line that lies INSIDE an InMemoryRelation subtree (its
    child plan is printed at each scan site but executes only at cache
    fill — once)."""
    out: list[str] = []
    stack: list[int] = []  # op columns of open InMemoryRelation nodes
    for line in plan.splitlines():
        col = _op_col(line)
        while stack and col <= stack[-1]:
            stack.pop()
        inside = bool(stack)
        if not inside:
            out.append(line)
        if "InMemoryRelation" in line:
            stack.append(col)
    return "\n".join(out)


def lint_plan(
    df: DataFrame,
    *,
    max_exchanges: int = 4,
    allow_cartesian: bool = False,
    allow_global_sort: bool = False,
) -> list[tuple[str, str]]:
    """Lint ``df``'s physical plan; returns (rule, evidence) findings."""
    return lint_plan_text(
        _physical_plan(df),
        max_exchanges=max_exchanges,
        allow_cartesian=allow_cartesian,
        allow_global_sort=allow_global_sort,
    )


def lint_plan_text(
    plan: str,
    *,
    max_exchanges: int = 4,
    allow_cartesian: bool = False,
    allow_global_sort: bool = False,
) -> list[tuple[str, str]]:
    """Text-level rule engine (exposed so tests can lint captured plans).

    All structural counting runs on the cache-stripped plan: an
    InMemoryRelation reprints its child subtree at every scan site, but
    that subtree executes once (at cache fill) — counting its exchanges
    or UDFs per-site would misread reuse as re-execution."""
    plan = _strip_cached_subtrees(plan)
    findings: list[tuple[str, str]] = []

    if not allow_cartesian:
        for op in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if op in plan:
                findings.append(("cartesian", op))

    if "BatchEvalPython" in plan:
        findings.append(("python-udf-row", "BatchEvalPython (row-at-a-time UDF)"))

    # duplicated Arrow UDF chains: the SAME udf call (name + args,
    # exprIds normalized away) evaluated on two ArrowEvalPython lines —
    # constraint-propagation duplication (an inferred `size(udf(..)) > 0`
    # from a Generate clones the whole chain below an Exchange; the
    # round-2 PQ bug). Distinct inputs normalize to distinct signatures,
    # so applying one udf to two different columns does not trip this;
    # cached subtrees are stripped first (InMemoryRelation repeats its
    # child plan TEXT at every scan site, but executes it once).
    sig_counts: dict[str, int] = {}
    for m in re.finditer(r"ArrowEvalPython \[([^\]]*)\]", plan):
        sig = re.sub(r"#\d+", "", m.group(1))
        sig_counts[sig] = sig_counts.get(sig, 0) + 1
    for sig, n in sig_counts.items():
        if n > 1:
            findings.append(
                ("python-chain-dup", f"udf call {sig[:60]!r} evaluated at {n} plan sites")
            )

    n_exchanges = plan.count("Exchange ")
    if n_exchanges > max_exchanges:
        findings.append(("exchange-storm", f"{n_exchanges} exchanges"))

    if not allow_global_sort:
        for line in plan.splitlines():
            s = line[_op_col(line):]
            # `Sort [...], true, 0` = GLOBAL (range exchange + full sort);
            # `, false,` is a per-partition sort (window/SMJ) — fine
            if s.startswith("Sort ") and "], true," in s and "TakeOrderedAndProject" not in plan:
                findings.append(("global-sort", s[:80]))
                break

    return findings


def assert_clean(df: DataFrame, **kwargs) -> None:
    """Raise AssertionError with the findings if the plan is not clean."""
    findings = lint_plan(df, **kwargs)
    assert not findings, f"plan lint findings: {findings}\n{_physical_plan(df)}"
