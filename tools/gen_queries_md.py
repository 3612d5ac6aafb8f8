"""Generate QUERIES.md — the catalog inventory mapped to SURVEY.md §2 IDs."""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from project_bigdata_spark.plans.catalog import load_all  # noqa: E402


def main() -> None:
    specs = load_all()
    lines = [
        "# QUERIES — catalog inventory",
        "",
        "Auto-generated from `project_bigdata_spark/plans/` "
        "(`python tools/gen_queries_md.py`). Every entry is exposed through "
        "`__spark_entry__.queries()`; entries with a DuckDB oracle are "
        "differentially verified by the driver at sf0.01.",
        "",
        f"**{len(specs)} queries** — "
        f"{sum(1 for s in specs.values() if s.oracle)} with oracles, "
        f"{sum(1 for s in specs.values() if s.headline)} bench headliners.",
        "",
        "| query | SURVEY §2 | oracle | bench | what it pins |",
        "|---|---|---|---|---|",
    ]
    for name, s in specs.items():
        ids = ", ".join(s.survey_ids) or "—"
        doc = " ".join(s.doc.split())
        if len(doc) > 160:
            doc = doc[:157] + "..."
        lines.append(
            f"| `{name}` | {ids} | {'✓' if s.oracle else 'rows-only'} "
            f"| {'✓' if s.headline else ''} | {doc} |"
        )

    coverage: dict[str, list[str]] = defaultdict(list)
    for name, s in specs.items():
        for sid in s.survey_ids:
            coverage[sid].append(name)
    lines += [
        "",
        "## SURVEY §2 coverage index",
        "",
        "| operator id | covered by |",
        "|---|---|",
    ]
    for sid in sorted(coverage):
        lines.append(f"| {sid} | " + ", ".join(f"`{q}`" for q in coverage[sid]) + " |")
    lines.append("")
    Path(__file__).resolve().parent.parent.joinpath("QUERIES.md").write_text(
        "\n".join(lines)
    )
    print(f"QUERIES.md: {len(specs)} queries, {len(coverage)} survey ids")


if __name__ == "__main__":
    main()
