#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/r11/.

Usage: python tools/capture_plans.py <suffix> [name ...]
Writes plans/r11/<query>_<suffix>.txt for each headliner (or the named subset).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from project_bigdata_spark.plans.catalog import load_all
from project_bigdata_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    specs = load_all()
    targets = [s for s in specs.values() if (s.name in names if names else s.headline)]
    spark = get_spark(app_name="capture_plans", cpus=8)
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    for s in targets:
        df = s.builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        (out_dir / f"{s.name}_{suffix}.txt").write_text(plan)
        print(f"wrote {s.name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
