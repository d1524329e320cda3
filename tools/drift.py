#!/usr/bin/env python3
"""Per-key bench drift tripwire (VERDICT r6 #6).

Diffs a fresh bench JSON (BENCH_SELF.json or any BENCH_r*.json — the
one-line {"metric":...,"queries":{...}} format graft.Bench prints)
against the per-query anchor table in BASELINE.md ("## rNN per-query
seconds"), and prints every key slower than THRESH x its anchor, so
environmental vs real regressions get separated the day they appear
instead of at judging time.

Usage: python3 tools/drift.py [bench.json] [--thresh 2.0] [--floor 0.4]

--floor suppresses keys whose absolute delta is under FLOOR seconds:
a 0.05 -> 0.12 s key is 2.4x but pure JVM noise on this box (BASELINE
documents a 73->160 s run-to-run total spread under transient load).
Exit code: 0 always (a tripwire, not a gate) - the bench wrapper keeps
its own exit semantics.
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_anchor(baseline_md: Path) -> dict:
    """Latest '## rNN per-query seconds' table: {key: seconds}."""
    text = baseline_md.read_text()
    sections = re.findall(
        r"## r(\d+) per-query seconds.*?(?=\n## |\Z)", text, re.S)
    if not sections:
        sys.exit("drift: no per-query table in BASELINE.md")
    # re.findall with one group returns the round numbers only; re-scan
    # for the section body of the highest round
    rounds = sorted(int(r) for r in sections)
    m = re.search(
        r"## r0*%d per-query seconds.*?(?=\n## |\Z)" % rounds[-1], text, re.S)
    body = m.group(0)
    anchor = {}
    for key, sec in re.findall(r"\|\s*`([a-z0-9_]+)`\s*\|\s*([0-9.]+)\s*\|", body):
        anchor[key] = float(sec)
    return anchor, rounds[-1]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bench_path = Path(args[0]) if args else REPO / "BENCH_SELF.json"
    thresh = 2.0
    floor = 0.4
    for a in sys.argv[1:]:
        if a.startswith("--thresh"):
            thresh = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
        if a.startswith("--floor"):
            floor = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])

    try:
        bench = json.loads(bench_path.read_text().strip().splitlines()[-1])
    except json.JSONDecodeError:
        sys.exit(f"drift: {bench_path} is not graft.Bench output "
                 "(expected one JSON line with a 'queries' map; the "
                 "driver's BENCH_r*.json wrapper with a truncated 'tail' "
                 "is not parseable - point at BENCH_SELF.json instead)")
    queries = bench.get("queries", {})
    anchor, rnd = load_anchor(REPO / "BASELINE.md")

    drifted, new_keys = [], []
    for key, sec in sorted(queries.items()):
        if key not in anchor:
            new_keys.append((key, sec))
            continue
        base = anchor[key]
        if sec > thresh * base and sec - base > floor:
            drifted.append((key, base, sec, sec / base))

    print(f"drift: {bench_path.name} vs BASELINE.md r{rnd:02d} anchor "
          f"({len(anchor)} anchored keys, thresh {thresh}x, floor {floor}s)")
    if drifted:
        print(f"drift: {len(drifted)} key(s) over {thresh}x anchor:")
        for key, base, sec, ratio in sorted(drifted, key=lambda t: -t[3]):
            print(f"  DRIFT {key}: {base:.2f}s -> {sec:.2f}s ({ratio:.1f}x)")
        print("drift: re-run each with SPARK_GRAFT_ONLY=<key> 5x before "
              "calling it a regression (box spread is 73-160s on totals)")
    else:
        print("drift: no key over threshold - clean")
    if new_keys:
        print(f"drift: {len(new_keys)} key(s) not in anchor (new this round): "
              + ", ".join(k for k, _ in new_keys))


if __name__ == "__main__":
    main()
