"""Audit every oracle SQL's DuckDB output types for hash-unstable columns.

The driver canonicalizes result values by stringification before hashing;
DuckDB HUGEINT (int128) columns arrive in pandas as float64 or object and
stringify differently than the engine's int64 (``str(1234.0)`` vs
``"1234"``) — the exact failure mode behind round-2's four
``hash_match: false`` entries.  This tool runs each oracle at sf0.001 with
``LIMIT 0`` semantics (full query, then dtype inspection of the DuckDB
relation types) and flags any HUGEINT / UHUGEINT / DECIMAL output column.

Usage: python tools/audit_oracle_types.py [sf_dir]
Exit code 1 if any oracle is flagged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part partsupp orders lineitem "
    "events documents embeddings"
).split()

BAD_TYPES = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from recon_ray.pipelines.queries import oracles_for

    oracles = oracles_for(sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    flagged = []
    errors = []
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            types = [str(t).upper() for t in rel.types]
        except Exception as e:  # noqa: BLE001
            errors.append((name, str(e).splitlines()[0]))
            continue
        bad = [
            (c, ty)
            for c, ty in zip(rel.columns, types)
            if any(b in ty for b in BAD_TYPES) or ty.startswith("DECIMAL")
        ]
        if bad:
            flagged.append((name, bad))
    for name, bad in flagged:
        print(f"FLAG {name}: {bad}")
    for name, err in errors:
        print(f"ERR  {name}: {err}")
    print(
        f"{len(oracles)} oracles audited, {len(flagged)} flagged, "
        f"{len(errors)} errored"
    )
    return 1 if flagged or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
