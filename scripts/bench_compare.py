"""Bench trend guard (VERDICT r4 item 5): diff two BENCH_r*.json files
per query and flag regressions, so perf drift surfaces in-round rather
than at judging.

Usage:
    python scripts/bench_compare.py                 # newest two BENCH_r*.json
    python scripts/bench_compare.py OLD.json NEW.json
    python scripts/bench_compare.py --threshold 0.25 --fail

Exit code is 0 unless --fail is given and a query regressed more than
the threshold. Queries absent from either side are reported as
added/removed, never as regressions. Sub-second queries get an absolute
floor (--floor, default 0.3 s) so jitter on 0.4 s queries doesn't page.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    # driver files wrap the bench line under "parsed"; bench.py output
    # is the flat object itself
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    return dict(doc.get("queries", {}))


def newest_two(repo_root: str) -> tuple[str, str]:
    def round_no(p: str) -> int:
        m = re.search(r"r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    files = sorted((p for p in glob.glob(os.path.join(repo_root, "BENCH_r*.json"))
                    if round_no(p) >= 0), key=round_no)
    if len(files) < 2:
        raise SystemExit("need two BENCH_r*.json files (or pass paths)")
    return files[-2], files[-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?")
    ap.add_argument("new", nargs="?")
    ap.add_argument("--threshold", type=float, default=0.25,
                    help="relative regression flagged above this (0.25 = +25%%)")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="ignore regressions smaller than this many seconds")
    ap.add_argument("--fail", action="store_true",
                    help="exit 1 when any query regresses past the threshold")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.old and args.new:
        old_p, new_p = args.old, args.new
    else:
        old_p, new_p = newest_two(repo_root)

    old, new = load_queries(old_p), load_queries(new_p)
    print(f"old: {os.path.basename(old_p)}  new: {os.path.basename(new_p)}")

    regressed: list[str] = []
    rows: list[tuple[str, str, float]] = []  # (marker, line, sort key)
    for name in sorted(set(old) | set(new)):
        if name not in old:
            rows.append(("+", f"+  {name}: new query, {new[name]:.2f}s",
                         (2, 0.0)))
            continue
        if name not in new:
            rows.append(("-", f"-  {name}: removed (was {old[name]:.2f}s)",
                         (2, 0.0)))
            continue
        a, b = old[name], new[name]
        delta = b - a
        rel = delta / a if a > 0 else 0.0
        line = f"   {name}: {a:.2f}s -> {b:.2f}s ({rel:+.0%})"
        # sort key: flagged regressions first (rank 0), then everything
        # else by regression size — a big improvement must not sort
        # above a flagged regression
        if rel > args.threshold and delta > args.floor:
            regressed.append(name)
            rows.append(("!", "!!" + line[2:], (0, -rel)))
        elif rel < -args.threshold and -delta > args.floor:
            rows.append(("v", " ^" + line[2:], (1, -rel)))
        else:
            rows.append((" ", line, (1, -rel)))
    for _, line, _ in sorted(rows, key=lambda r: r[2]):
        print(line)

    shared = set(old) & set(new)
    ot = sum(v for k, v in old.items() if k in shared)
    nt = sum(v for k, v in new.items() if k in shared)
    if shared and ot > 0:
        print(f"comparable total: {ot:.2f}s -> {nt:.2f}s "
              f"({(nt - ot) / ot:+.1%} over {len(shared)} queries)")
    else:
        print("no comparable queries between the two files")
    if regressed:
        print(f"REGRESSED (> +{args.threshold:.0%} and > {args.floor}s): "
              f"{', '.join(regressed)}")
        return 1 if args.fail else 0
    print("no regressions past threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
