"""Declarative data-quality expectations over DataFrames / IceTables.

The dbt-test / Great-Expectations pattern a curation pipeline runs
before promoting a batch: each rule states an invariant, the checker
returns one row per rule with its violation count. Designed for one
pass where possible:

- every AGGREGATE rule (not_null, accepted_values, in_range, matches,
  unique_combination-free expressions) compiles into a single
  ``agg(...)`` over the input — ONE scan however many rules;
- ``unique`` needs its own groupBy (a shuffle per distinct key set —
  key sets are deduped so two rules on the same key share it);
- ``references`` (foreign key) is one left-anti join per relation,
  broadcast when the parent side is small (Spark/AQE decides).

Nothing collects row data: violations are counts; ``violations_df``
returns the offending rows of one rule for debugging, lazily.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    kind: str
    column: str
    # rule-specific payload (values list, bounds, parent df, expression)
    payload: dict = dc_field(default_factory=dict)

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"

    def violation_cond(self, df: DataFrame) -> Optional[Column]:
        """Row-level violation predicate for aggregate rules; None for
        rules that need their own plan (unique/references)."""
        c = F.col(self.column) if self.column else None
        if self.kind == "not_null":
            return c.isNull()
        if self.kind == "accepted_values":
            return c.isNotNull() & ~c.isin(self.payload["values"])
        if self.kind == "in_range":
            lo, hi = self.payload["lo"], self.payload["hi"]
            cond = F.lit(False)
            if lo is not None:
                cond = cond | (c < F.lit(lo))
            if hi is not None:
                cond = cond | (c > F.lit(hi))
            return c.isNotNull() & cond
        if self.kind == "matches":
            return c.isNotNull() & ~c.rlike(self.payload["pattern"])
        if self.kind == "satisfies":
            return ~F.coalesce(self.payload["expr"], F.lit(False))
        return None


def not_null(column: str) -> Rule:
    return Rule("not_null", column)


def unique(*columns: str) -> Rule:
    return Rule("unique", ",".join(columns), {"columns": list(columns)})


def accepted_values(column: str, values: list) -> Rule:
    return Rule("accepted_values", column, {"values": list(values)})


def in_range(column: str, lo: Any = None, hi: Any = None) -> Rule:
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    return Rule("in_range", column, {"lo": lo, "hi": hi})


def matches(column: str, pattern: str) -> Rule:
    return Rule("matches", column, {"pattern": pattern})


def satisfies(name: str, expr: Column) -> Rule:
    """Arbitrary row invariant: ``expr`` must be TRUE (null = violation)."""
    return Rule("satisfies", name, {"expr": expr})


def references(column: str, parent: DataFrame, parent_column: str) -> Rule:
    """Foreign key: every non-null value must exist in
    ``parent[parent_column]``."""
    return Rule("references", column,
                {"parent": parent, "parent_column": parent_column})


def check(data, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, col, violations, total,
    passed) — one row per rule, aggregate rules fused into ONE scan."""
    df = data.to_df() if hasattr(data, "to_df") else data
    spark = df.sparkSession

    agg_rules = [r for r in rules if r.violation_cond(df) is not None]
    results: list[tuple] = []
    if agg_rules:
        aggs = [F.count(F.lit(1)).alias("_total")]
        for i, r in enumerate(agg_rules):
            aggs.append(F.sum(r.violation_cond(df).cast("long"))
                        .alias(f"_v{i}"))
        row = df.agg(*aggs).collect()[0]
        total = row["_total"]
        for i, r in enumerate(agg_rules):
            v = row[f"_v{i}"] or 0
            results.append((r.name, r.column, int(v), int(total), v == 0))
    else:
        total = None

    uniq_keys = {}
    for r in rules:
        if r.kind == "unique":
            uniq_keys.setdefault(tuple(r.payload["columns"]), r)
    for cols, r in uniq_keys.items():
        dup = (df.groupBy(*cols)
               .agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > 1)
               .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("_dups"),
                    F.count(F.lit(1)).alias("_keys"))
               .collect()[0])
        v = int(dup["_dups"])  # rows participating in a duplicate key
        t = total if total is not None else df.count()
        results.append((r.name, r.column, v, int(t), v == 0))

    for r in rules:
        if r.kind != "references":
            continue
        parent = (r.payload["parent"].select(
            F.col(r.payload["parent_column"]).alias("_pk")).distinct())
        v = (df.select(F.col(r.column).alias("_fk"))
             .filter(F.col("_fk").isNotNull())
             .join(parent, F.col("_fk") == F.col("_pk"), "left_anti")
             .count())
        t = total if total is not None else df.count()
        results.append((r.name, r.column, int(v), int(t), v == 0))

    return spark.createDataFrame(
        results,
        "rule string, col string, violations long, total long, "
        "passed boolean").orderBy("rule")


def violations_df(data, rule: Rule) -> DataFrame:
    """The offending rows of one rule (debugging surface; lazy)."""
    df = data.to_df() if hasattr(data, "to_df") else data
    cond = rule.violation_cond(df)
    if cond is not None:
        return df.filter(cond)
    if rule.kind == "unique":
        cols = rule.payload["columns"]
        dups = (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1).drop("_n"))
        return df.join(dups, cols, "left_semi")
    if rule.kind == "references":
        parent = (rule.payload["parent"].select(
            F.col(rule.payload["parent_column"]).alias("_pk")).distinct())
        return (df.filter(F.col(rule.column).isNotNull())
                .join(parent, F.col(rule.column) == F.col("_pk"),
                      "left_anti"))
    raise ValueError(f"unknown rule kind: {rule.kind}")


# ---------------------------------------------------------------------------
# Expectations → write-audit-publish curation gate (VERDICT r10 task 8):
# the X18+X19 composition a promotion pipeline runs — stage the batch as
# a WAP snapshot (no reader sees it), audit the STAGED TABLE STATE with
# the rules, publish on pass, leave main untouched on fail.
# ---------------------------------------------------------------------------

@dataclass
class GateResult:
    """Outcome of one gated batch. ``table`` is the post-publish handle
    when ``published`` (main advanced by cherry-pick), else the
    pre-gate handle whose metadata carries the staged snapshot —
    inspect it with ``table.scan(snapshot_id=staged_snapshot_id)`` and
    ``violations_df`` on the failing rules, then either fix + retry
    under a new wap id or expire the staged snapshot."""
    table: Any
    report: DataFrame
    published: bool
    wap_id: str
    staged_snapshot_id: int

    def failed_rules(self) -> list[str]:
        return [r["rule"] for r in self.report.collect()
                if not r["passed"]]


def expectations_wap_gate(table, batch: DataFrame, rules: list[Rule],
                          wap_id: Optional[str] = None) -> GateResult:
    """Stage ``batch`` on ``table`` under ``wap_id``, audit the staged
    snapshot's TABLE STATE (not just the batch — so e.g. ``unique``
    catches cross-batch duplicates) with ``rules``, and publish the
    snapshot to main only when every rule passes.

    Readers never observe an unaudited batch: the staged snapshot
    lives in metadata without moving any ref until the cherry-pick,
    and a failed audit leaves main bit-for-bit unchanged. The audit is
    the same fused one-scan ``check`` used standalone; publish is
    metadata-only (no data rewritten)."""
    import uuid

    wid = wap_id or uuid.uuid4().hex[:16]
    staged = table.append(batch, wap_id=wid)
    sn = staged.wap_snapshot(wid)
    staged_df = staged.scan(snapshot_id=sn.snapshot_id).to_df()
    report = check(staged_df, rules)
    ok = all(r["passed"] for r in report.collect())
    if ok:
        return GateResult(staged.publish_wap(wid), report, True, wid,
                          sn.snapshot_id)
    return GateResult(staged, report, False, wid, sn.snapshot_id)
