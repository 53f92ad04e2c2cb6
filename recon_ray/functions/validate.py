"""Declarative data-validation / expectations suite — the "gate the
pipeline on data quality" layer (what Great-Expectations-style checks do
in production ETL), run as Ray Data passes so 100 TB validates at scan
speed instead of notebook speed.

Rule kinds and their exact (SQL-replicable) semantics:

- ``not_null(col)``            violations = rows where col IS NULL
- ``range(col, lo, hi)``       violations = non-NULL rows outside
                               [lo, hi] (inclusive); NULLs are
                               ``not_null``'s job, not range's
- ``accepted(col, values)``    violations = non-NULL rows whose value is
                               not in the list
- ``regex(col, pattern)``      violations = non-NULL rows NOT matching
                               the (unanchored, RE2-class) pattern
- ``unique(col)``              violations = non-NULL rows minus distinct
                               non-NULL values (duplicate mass)
- ``fk(col, ref, ref_col)``    violations = non-NULL rows whose key has
                               no match in the referenced table (SQL
                               referential-integrity semantics: NULL
                               FKs never violate). The two key columns
                               must share an Arrow type — the check is
                               a hash anti-join, which (correctly)
                               refuses float-vs-int key equality

``n_checked`` reports the denominator each rule examined (all rows for
not_null; non-NULL rows otherwise).

Scale shape: every batch-local rule for a table rides ONE combiner
map_batches pass (all rules evaluated per batch with pyarrow kernels,
tiny partial-count rows summed on the driver). ``unique`` adds one
bucketed exact-distinct shuffle per rule; ``fk`` adds one hash-partition
anti semi-join per rule (both sides stream — the referenced table is
never collected). Oracled end-to-end by ``q_validate_suite``.
"""

from __future__ import annotations


import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _batch_rule_counts(rules):
    """One pyarrow pass evaluating all batch-local rules."""

    def count(t: pa.Table) -> pa.Table:
        names, viol, checked = [], [], []
        for r in rules:
            col = t.column(r["col"])
            nonnull = t.num_rows - col.null_count
            kind = r["kind"]
            if kind == "not_null":
                names.append(r["id"])
                viol.append(col.null_count)
                checked.append(t.num_rows)
                continue
            v = col.drop_null()
            if kind == "range":
                bad = pc.sum(pc.or_(
                    pc.less(v, pa.scalar(r["lo"])),
                    pc.greater(v, pa.scalar(r["hi"])),
                )).as_py() or 0
            elif kind == "accepted":
                bad = pc.sum(pc.invert(pc.is_in(
                    v, value_set=pa.array(r["values"], v.type)
                ))).as_py() or 0
            elif kind == "regex":
                bad = pc.sum(pc.invert(pc.match_substring_regex(
                    v, r["pattern"]
                ))).as_py() or 0
            else:  # pragma: no cover
                raise ValueError(f"not a batch-local rule: {kind}")
            names.append(r["id"])
            viol.append(int(bad))
            checked.append(int(nonnull))
        return pa.table({
            "rule": pa.array(names, pa.string()),
            "violations": pa.array(viol, pa.int64()),
            "n_checked": pa.array(checked, pa.int64()),
        })

    return count


def check_expectations(ds, rules: list[dict],
                       refs: dict[str, "object"] | None = None
                       ) -> pd.DataFrame:
    """Run a rule list against ``ds``. Each rule dict needs ``kind``,
    ``col`` and a unique ``id``; ``fk`` rules name a table in ``refs``
    via ``ref`` plus its ``ref_col``. Returns a tiny DataFrame
    (rule, violations, n_checked) sorted by rule id."""
    from recon_ray.functions.relational import (
        arrow_filter, distinct, shuffle_semi_join,
    )

    for r in rules:
        r.setdefault("id", f'{r["kind"]}.{r["col"]}')
    ids = [r["id"] for r in rules]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate rule ids: {ids}")

    batch_rules = [r for r in rules
                   if r["kind"] in ("not_null", "range", "accepted",
                                    "regex")]
    out_rows: list[dict] = []

    if batch_rules:
        partials = ds.map_batches(
            _batch_rule_counts(batch_rules), batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()  # (#rules × #batches) tiny rows
        agg = partials.groupby("rule", as_index=False).sum()
        out_rows.extend(agg.to_dict("records"))

    for r in rules:
        if r["kind"] == "unique":
            col = r["col"]
            vals = arrow_filter(
                ds.select_columns([col]),
                lambda t, c=col: pc.is_valid(t.column(c)),
            )
            n_nonnull = vals.count()
            n_distinct = distinct(vals, [col]).count()
            out_rows.append({"rule": r["id"],
                             "violations": int(n_nonnull - n_distinct),
                             "n_checked": int(n_nonnull)})
        elif r["kind"] == "fk":
            col, ref_col = r["col"], r["ref_col"]
            ref_ds = refs[r["ref"]]
            left = arrow_filter(
                ds.select_columns([col]),
                lambda t, c=col: pc.is_valid(t.column(c)),
            )
            n_nonnull = left.count()
            orphans = shuffle_semi_join(
                left, ref_ds.select_columns([ref_col]),
                on=col, right_on=ref_col, anti=True,
            ).count()
            out_rows.append({"rule": r["id"], "violations": int(orphans),
                             "n_checked": int(n_nonnull)})

    out = pd.DataFrame(out_rows, columns=["rule", "violations",
                                          "n_checked"])
    out["violations"] = out["violations"].astype("int64")
    out["n_checked"] = out["n_checked"].astype("int64")
    return out.sort_values("rule").reset_index(drop=True)
