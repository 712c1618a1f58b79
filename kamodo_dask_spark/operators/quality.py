"""Data-quality constraint validation and privacy-preserving release.

Production tables ship with CONTRACTS — completeness floors, key
uniqueness, value domains, referential integrity — and a 100 TB engine
must check them without one job per rule (the Deequ/Great-Expectations
lesson: a naive validator scans the table once per constraint; a real
one fuses every row-local rule into a single aggregation pass). The
reference has no validation surface at all; this module adds one, plus
the release-side counterpart: k-anonymity suppression of
quasi-identifier combinations too rare to publish.

Scale design:

- ``constraint_audit`` fuses ALL row-local rules (completeness, domain,
  range, arbitrary predicate) into ONE conditional-aggregate scan —
  adding a rule adds a column to the agg, never a scan. Uniqueness
  rules each add one two-stage keyed aggregation (duplicate detection
  is a shuffle on any engine); referential rules each add one
  LEFT ANTI join against the referenced key set (broadcast when the
  dimension is broadcast-able, which FK targets usually are).
- ``k_anonymize`` is one window pass: group sizes over the
  quasi-identifier tuple, suppress (NULL out) the tuple on rows whose
  group is smaller than ``k``. One shuffle on the QI key, row-local
  rewrite, no driver state — the same plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: check kinds whose metric is a row-local fraction (fused into one scan)
_ROW_LOCAL = ("completeness", "in_set", "in_range", "predicate")


def constraint_audit(
    df: DataFrame,
    checks: list[dict],
    round_digits: int = 6,
) -> DataFrame:
    """Validate a batch of declarative constraints, returning one row per
    check: ``(check, kind, metric, threshold, passed)``.

    Each element of ``checks`` is a dict with ``name``, ``kind``, and
    kind-specific keys; ``metric`` is always a fraction in [0, 1] and the
    check passes when ``metric >= threshold`` (default 1.0 — exact):

    - ``completeness``: ``col`` — fraction of rows with ``col`` NOT NULL.
    - ``in_set``: ``col``, ``values`` — fraction of NON-NULL values in
      the allowed set (NULLs are completeness's job, not the domain's).
    - ``in_range``: ``col``, ``lo``, ``hi`` — fraction of non-null
      values in [lo, hi].
    - ``predicate``: ``expr`` (a Column or SQL string) — fraction of
      rows satisfying it (NULL counts as failing, like a WHERE).
    - ``unique``: ``cols`` — fraction of rows whose key tuple occurs
      exactly once (the Deequ uniqueness metric; 1.0 = a true key).
      NULL-bearing tuples group together, matching groupBy semantics.
    - ``referential``: ``col``, ``ref`` (DataFrame), ``ref_col`` —
      fraction of non-null FK values present in the referenced key set.

    Empty input: row-local metrics and uniqueness report 1.0 (vacuously
    satisfied), as does referential with no non-null FKs.
    """
    if not checks:
        raise ValueError("need at least one check")
    names = [c["name"] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names in {names}")

    def frac(cond: Column, denom: Column) -> Column:
        # avg over an explicit denominator population; empty -> 1.0
        num = F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
        return F.coalesce(
            num / F.nullif(F.sum(denom), F.lit(0)), F.lit(1.0)
        )

    row_local = [c for c in checks if c["kind"] in _ROW_LOCAL]
    aggs = []
    for c in row_local:
        if c["kind"] == "completeness":
            aggs.append(frac(F.col(c["col"]).isNotNull(), F.lit(1)))
        elif c["kind"] == "in_set":
            v = F.col(c["col"])
            aggs.append(
                frac(
                    v.isin(*c["values"]),
                    v.isNotNull().cast("int"),
                )
            )
        elif c["kind"] == "in_range":
            v = F.col(c["col"])
            aggs.append(
                frac(
                    (v >= F.lit(c["lo"])) & (v <= F.lit(c["hi"])),
                    v.isNotNull().cast("int"),
                )
            )
        else:  # predicate
            e = c["expr"]
            cond = F.expr(e) if isinstance(e, str) else e
            aggs.append(frac(cond, F.lit(1)))
    parts: list[DataFrame] = []
    if row_local:
        # ONE scan for every row-local rule, unpivoted to long form
        wide = df.agg(
            *[a.alias(f"_m{i}") for i, a in enumerate(aggs)]
        )
        def q(s: str) -> str:
            # SQL string literal escaping — a check name containing a
            # quote OR backslash must pass through intact, never be
            # silently altered ('back\\slash' -> 'backslash' would break
            # the threshold lookup) or die as a ParseException (trailing
            # backslash escaping the closing quote). Backslashes first.
            return s.replace("\\", "\\\\").replace("'", "''")

        stack = ", ".join(
            f"'{q(c['name'])}', '{q(c['kind'])}', _m{i}"
            for i, c in enumerate(row_local)
        )
        parts.append(
            wide.select(
                F.expr(
                    f"stack({len(row_local)}, {stack}) AS (check, kind, _metric)"
                )
            )
        )
    for c in checks:
        if c["kind"] == "unique":
            keyed = (
                df.groupBy(*c["cols"])
                .agg(F.count("*").alias("_n"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_n") == 1, F.lit(1)).otherwise(0))
                        / F.nullif(F.sum("_n"), F.lit(0)),
                        F.lit(1.0),
                    ).alias("_metric")
                )
            )
            parts.append(
                keyed.select(
                    F.lit(c["name"]).alias("check"),
                    F.lit("unique").alias("kind"),
                    "_metric",
                )
            )
        elif c["kind"] == "referential":
            # ONE scan of the FK side: left join against the (broadcast)
            # referenced key set with a presence flag, then a single avg.
            # A count + anti-join-count pair would need a scalar crossJoin
            # to combine — which plans as BroadcastNestedLoopJoin, banned
            # repo-wide by the plan sweep.
            fk = df.select(F.col(c["col"]).alias("_fk")).filter(
                F.col("_fk").isNotNull()
            )
            refk = (
                c["ref"]
                .select(F.col(c["ref_col"]).alias("_fk"))
                .filter(F.col("_fk").isNotNull())
                .distinct()
                .withColumn("_hit", F.lit(1))
            )
            m = (
                fk.join(F.broadcast(refk), "_fk", "left")
                .agg(
                    F.coalesce(
                        F.avg(F.coalesce(F.col("_hit"), F.lit(0))),
                        F.lit(1.0),
                    ).alias("_metric")
                )
            )
            parts.append(
                m.select(
                    F.lit(c["name"]).alias("check"),
                    F.lit("referential").alias("kind"),
                    "_metric",
                )
            )
        elif c["kind"] not in _ROW_LOCAL:
            raise ValueError(f"unknown check kind {c['kind']!r}")

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    thr = {c["name"]: float(c.get("threshold", 1.0)) for c in checks}
    thr_col = F.lit(None).cast("double")
    for name, t in thr.items():
        thr_col = F.when(F.col("check") == name, F.lit(t)).otherwise(thr_col)
    return (
        out.select(
            "check",
            "kind",
            F.round(F.col("_metric").cast("double"), round_digits).alias(
                "metric"
            ),
            thr_col.alias("threshold"),
        )
        .withColumn("passed", F.col("metric") >= F.col("threshold"))
        .orderBy("check")
    )


def k_anonymize(
    df: DataFrame,
    qi_cols: list[str],
    k: int,
    out_group_col: str = "qi_group_size",
) -> DataFrame:
    """Suppress quasi-identifier combinations rarer than ``k`` rows —
    the release gate of k-anonymity (Sweeney 2002): after suppression,
    every published QI tuple is shared by >= k rows or fully NULLed.

    One window pass: ``count(*) over (partition by QI)`` sizes each
    equivalence class; rows in classes smaller than ``k`` get every QI
    column replaced with NULL. Non-QI columns pass through untouched.
    The emitted ``out_group_col`` carries the ORIGINAL class size
    (auditable); suppressed rows still show theirs — publishers drop the
    column before release, auditors keep it.

    NULL QI values group together (SQL groupBy semantics): an
    already-NULL tuple is its own equivalence class and is suppressed
    like any other if rare. 100 TB shape: one hash shuffle on the QI
    tuple, then a row-local conditional projection — no second scan, no
    driver state, no skew risk beyond the QI distribution itself (a
    heavy QI class is by definition not suppressed, and Spark's window
    count needs no per-row ordering, so AQE handles the partition
    sizing).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    missing = [c for c in qi_cols if c not in df.columns]
    if missing:
        raise ValueError(f"QI columns not in frame: {missing}")
    if out_group_col in df.columns:
        raise ValueError(
            f"out_group_col {out_group_col!r} collides with a data column"
        )
    w = Window.partitionBy(*qi_cols)
    sized = df.withColumn(out_group_col, F.count("*").over(w))
    small = F.col(out_group_col) < k
    qi = set(qi_cols)
    # INPUT column order is preserved (a positional writer downstream
    # must not get QI values in the wrong slots); only the group-size
    # column is appended
    return sized.select(
        *[
            F.when(small, F.lit(None).cast(dict(df.dtypes)[c]))
            .otherwise(F.col(c))
            .alias(c)
            if c in qi
            else F.col(c)
            for c in df.columns
        ],
        F.col(out_group_col).cast("bigint").alias(out_group_col),
    )
