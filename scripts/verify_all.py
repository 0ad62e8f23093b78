"""One-command verification battery — everything the round's claims rest
on, in dependency order:

  1. pytest tests/ (unit + parity at sf0.001 + plan contracts + lint)
  2. full oracle sweep, vanilla session, sf0.01 and sf0.1
  3. adversarial-session sweeps (hostile, degenerate)
  4. bench.py (standing-baseline regression gate)

Usage: python scripts/verify_all.py [--skip-bench] [--skip-suite]
Exit 0 only if every stage passes. Stages run in SEPARATE processes
(session confs stick; a sweep must not inherit the suite's session).

CLOSING PROTOCOL (VERDICT r9 #1 — the r9 red-suite defect): this
battery must be the LAST thing before round close, run ON the final
commit. Any commit made after a battery run invalidates it — at
minimum re-run `pytest tests/` at the new HEAD before closing (the r9
failure was a post-battery commit that changed a plan shape without
refreshing tests/plan_shapes.json). The battery now prints the HEAD it
ran at so the closing log is checkable against `git log -1`.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

SWEEP_SNIPPET = r"""
import sys
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16").getOrCreate())
from cses2humio_spark.queries.compare import compare_query
from cses2humio_spark.queries import QUERIES, ORACLES
bad = []
for name, fn in QUERIES.items():
    try:
        r = compare_query(spark, {sf_dir!r}, fn, ORACLES.get(name))
        if not r["ok"]:
            bad.append((name, str(r["status"])[:150]))
    except Exception as ex:  # noqa: BLE001 — survey everything
        bad.append((name, f"{{type(ex).__name__}}: {{ex}}"[:150]))
print("SWEEP", {sf_dir!r}, "FAILED:", bad or "none", flush=True)
sys.exit(1 if bad else 0)
"""


def run(desc: str, argv: list[str], *, code: str | None = None) -> bool:
    print(f"== {desc}", flush=True)
    if code is not None:
        proc = subprocess.run([PY, "-c", code], cwd="/tmp")
    else:
        proc = subprocess.run(argv, cwd=ROOT)
    ok = proc.returncode == 0
    print(f"== {desc}: {'OK' if ok else 'FAILED'}", flush=True)
    return ok


def main() -> int:
    skip_bench = "--skip-bench" in sys.argv
    skip_suite = "--skip-suite" in sys.argv
    head = subprocess.run(
        ["git", "log", "-1", "--format=%h %s"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    ).stdout.strip()
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    print(f"== battery @ HEAD {head}{' (DIRTY WORKING TREE)' if dirty else ''}")
    results: list[tuple[str, bool]] = []

    if not skip_suite:
        results.append(
            ("pytest", run("pytest tests/", [PY, "-m", "pytest", "tests/", "-q"]))
        )
    for sf in ("0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        results.append(
            (
                f"sweep sf{sf}",
                run(
                    f"oracle sweep sf{sf}",
                    [],
                    code=SWEEP_SNIPPET.format(root=ROOT, sf_dir=sf_dir),
                ),
            )
        )
    for variant in ("hostile", "degenerate"):
        results.append(
            (
                variant,
                run(
                    f"{variant} session sweep",
                    [PY, os.path.join(ROOT, "scripts", "hostile_probe.py"), variant],
                ),
            )
        )
    if not skip_bench:
        results.append(
            ("bench", run("bench.py", [PY, os.path.join(ROOT, "bench.py")]))
        )

    print("\n== SUMMARY")
    for name, ok in results:
        print(f"  {name:16s} {'OK' if ok else 'FAILED'}")
    return 0 if all(ok for _, ok in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
