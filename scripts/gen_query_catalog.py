"""Regenerate QUERIES.md from the registry docstrings.

Also computes the STALENESS table (VERDICT r11 #1): for every oracle
entry, the latest round whose CORRECTNESS_r*.json graded it — the
hand-maintained CLAUDE.md rotation note under-counted the debt twice, so
the grade-freshness ledger is generated from the driver artifacts now.
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_mm_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_grades() -> dict[str, int]:
    """name -> latest round with a green grade in CORRECTNESS_r{N}.json."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


registry.load_all()
grades = latest_grades()
order = registry.ordered_names()
cur_round = max(grades.values(), default=0)

lines = [
    "# Query catalog",
    "",
    "Auto-generated from `flink_mm_spark.registry` (the `queries()` surface the",
    "driver exercises). 'oracle' = hash-matched against DuckDB at sf0.01;",
    "'rows-only' = genuinely non-SQL-expressible (approximate/iterative), checked",
    "for stable execution. 'window' = position in the driver's graded window",
    "(the first GRADE_WINDOW entries of queries(); see registry.PROMOTE).",
    "'last grade' = latest round whose CORRECTNESS_r*.json graded the entry",
    "green (computed from the artifacts — the staleness ledger the rotation",
    "policy works down; 'new' = lands this round, not yet driver-graded).",
    "Regenerate: `python scripts/gen_query_catalog.py`.",
    "",
    "| query | check | window | last grade | what it does |",
    "|---|---|---|---|---|",
]
for name, spec in sorted(registry.QUERIES.items()):
    doc = (spec.doc or "").split("\n")[0].strip().rstrip(".")
    kind = "oracle" if spec.oracle else "rows-only"
    pos = order.index(name)
    win = str(pos + 1) if pos < registry.GRADE_WINDOW else "—"
    last = f"r{grades[name]}" if name in grades else ("new" if spec.oracle else "—")
    lines.append(f"| `{name}` | {kind} | {win} | {last} | {doc} |")

# staleness summary: oracle entries by latest grade, oldest first
stale = sorted(
    (
        (grades.get(n, 0), n)
        for n, s in registry.QUERIES.items()
        if s.oracle is not None
    ),
)
by_round: dict[int, list[str]] = {}
for rnd, n in stale:
    by_round.setdefault(rnd, []).append(n)
lines += [
    "",
    "## Grade freshness (oracle entries by latest driver grade)",
    "",
    f"As of `CORRECTNESS_r{cur_round}.json` — the latest driver artifact at",
    "generation time. The table is regenerated each round BEFORE the driver",
    "grades, so entries promoted into the current window still show their",
    "previous grade here (VERDICT r12 'what's wrong' #2: stamp the",
    "provenance so a reader never misreads the debt).",
    "",
    "| latest grade | n | entries |",
    "|---|---|---|",
]
for rnd in sorted(by_round):
    label = f"r{rnd}" if rnd else "never (new this round)"
    names = ", ".join(f"`{n}`" for n in by_round[rnd])
    lines.append(f"| {label} | {len(by_round[rnd])} | {names} |")

out = os.path.join(REPO, "QUERIES.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
stale_le3 = sum(len(v) for r, v in by_round.items() if 0 < r <= 3)
print(
    f"wrote {out} ({len(registry.QUERIES)} queries; latest artifact r{cur_round}; "
    f"{stale_le3} oracle entries last graded <= r3)"
)
