"""Regenerate QUERIES.md from the registry docstrings."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_mm_spark import registry

registry.load_all()
lines = [
    "# Query catalog",
    "",
    "Auto-generated from `flink_mm_spark.registry` (the `queries()` surface the",
    "driver exercises). 'oracle' = hash-matched against DuckDB at sf0.01;",
    "'rows-only' = genuinely non-SQL-expressible (approximate/iterative), checked",
    "for stable execution. 'window' = position in the driver's graded window",
    "(the first GRADE_WINDOW entries of queries(); see registry.PROMOTE — the",
    "r5 rotation is a regression-sentinel mix, every oracle entry having been",
    "driver-proven at least once across rounds 1-4).",
    "Regenerate: `python scripts/gen_query_catalog.py`.",
    "",
    "| query | check | window | what it does |",
    "|---|---|---|---|",
]
order = registry.ordered_names()
for name, spec in sorted(registry.QUERIES.items()):
    doc = (spec.doc or "").split("\n")[0].strip().rstrip(".")
    kind = "oracle" if spec.oracle else "rows-only"
    pos = order.index(name)
    win = str(pos + 1) if pos < registry.GRADE_WINDOW else "—"
    lines.append(f"| `{name}` | {kind} | {win} | {doc} |")

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out} ({len(registry.QUERIES)} queries)")
