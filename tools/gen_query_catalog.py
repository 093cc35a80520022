#!/usr/bin/env python
"""Regenerate QUERIES.md — the per-query catalog (id, verification mode,
description) from the live registry. Run from the repo root:

    python tools/gen_query_catalog.py > QUERIES.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from iceberg_poc_spark.registry import load_all  # noqa: E402


def main() -> None:
    qs = load_all()
    n_oracle = sum(1 for q in qs.values() if q.oracle)
    print("# Query catalog")
    print()
    rest = (
        ", the rest rows-only by design"
        if n_oracle < len(qs)
        else " — every registered query is oracle-bearing"
    )
    print(
        f"{len(qs)} registered queries; {n_oracle} verified value-for-value "
        "against DuckDB oracles at sf0.01 (driver contract in "
        f"`__spark_entry__.py`){rest}. "
        "Regenerate with `python tools/gen_query_catalog.py > QUERIES.md`."
    )
    print()
    print("| query id | check | description |")
    print("|---|---|---|")
    for name in sorted(qs):
        q = qs[name]
        mode = "oracle" if q.oracle else "rows-only"
        doc = " ".join((q.doc or "").split())
        print(f"| `{name}` | {mode} | {doc} |")


if __name__ == "__main__":
    main()
