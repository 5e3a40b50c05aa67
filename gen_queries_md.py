#!/usr/bin/env python
"""Regenerate QUERIES.md (the navigation index) from the registry.

Run from the repo root: ``python gen_queries_md.py``. The registry is
the source of truth; this file just renders it.
"""

from __future__ import annotations


def main() -> None:
    from hailstorm_spark.registry import all_queries

    lines = [
        "# QUERIES — the registered surface, generated from the registry",
        "",
        "Every entry has a PySpark implementation and a DuckDB oracle; the",
        "driver checks the first ~50 per round (`registry.CHECK_FIRST`), and",
        "`tests/test_oracle_parity.py` sweeps ALL of them each pytest run.",
        "Regenerate with `python gen_queries_md.py`; this file is a",
        "navigation index, the registry is the source of truth.",
        "",
        "| # | query | tags | summary |",
        "|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(all_queries().items(), 1):
        doc = (spec.doc or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        if doc and not first.endswith(".") and len(doc) > 1:
            first = first + " " + doc[1].strip()
        first = first.replace("|", "\\|")
        if len(first) > 160:
            first = first[:157] + "..."
        lines.append(f"| {i} | `{name}` | {', '.join(spec.tags)} | {first} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {i} entries")


if __name__ == "__main__":
    main()
