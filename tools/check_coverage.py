#!/usr/bin/env python3
"""Cross-check COVERAGE.md against SparkEntry.queries.

Round 11 fixed 16 stale COVERAGE cells by hand; this makes that class of
drift impossible: every gate key in SparkEntry.queries must be cited in
COVERAGE.md, and every q_* citation in COVERAGE.md must be a live gate.

Exit 0 = clean; exit 1 lists the drift. Run from the repo root:
    python3 tools/check_coverage.py
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SPARK_ENTRY = ROOT / "src/main/scala/graft/SparkEntry.scala"
COVERAGE = ROOT / "COVERAGE.md"

# a gate entry looks like:  "q_name" -> ((s, dir) => {
GATE_RE = re.compile(r'"(q[\w]+)"\s*->\s*\(\(s, dir\)')
CITE_RE = re.compile(r"\b(q_[\w]+)\b")


def main() -> int:
    entry = SPARK_ENTRY.read_text()
    gates = set(GATE_RE.findall(entry))
    if not gates:
        print("ERROR: no gates parsed from SparkEntry.scala — regex drift?")
        return 1
    cov = COVERAGE.read_text()
    cited = set(CITE_RE.findall(cov))

    # q1_agg is the one non-q_* gate name; normalize it into both sides
    if "q1_agg" in entry:
        gates.add("q1_agg")
    if "q1_agg" in cov:
        cited.add("q1_agg")

    uncited = sorted(gates - cited)
    stale = sorted(cited - gates)
    ok = True
    if uncited:
        ok = False
        print(f"GATES MISSING FROM COVERAGE.md ({len(uncited)}):")
        for g in uncited:
            print(f"  {g}")
    if stale:
        ok = False
        print(f"STALE COVERAGE.md CITATIONS (no such gate, {len(stale)}):")
        for g in stale:
            print(f"  {g}")
    if ok:
        print(f"OK: {len(gates)} gates all cited, no stale citations")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
