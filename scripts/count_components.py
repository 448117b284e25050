#!/usr/bin/env python3
"""Mechanical component count (round-11 verdict task 7).

The verdict's per-round component figure must be reproducible from
the tree, not re-derived by eye.  This counts COVERAGE.md ledger rows:

  - "parity"     = table rows in the SURVEY.md §2 sections (the
                   reference's own operator surface)
  - "extension"  = table rows in the "Extension track" section (the
                   LLM-data-pipeline operators beyond the reference)

A row is one `| ...` table line; header/divider lines (`| --- |`,
`|---|`) are excluded.  Prints one JSON line; exit 0.

Usage: scripts/count_components.py [path-to-COVERAGE.md]
"""
import json
import re
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "COVERAGE.md"
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()

    in_extension = False
    parity = 0
    extension = 0
    for line in lines:
        if line.startswith("## "):
            in_extension = line.startswith("## Extension track")
            continue
        if not line.startswith("| "):
            continue
        # skip markdown table header-divider rows and column-name rows
        cells = [c.strip() for c in line.strip("|").split("|")]
        if all(re.fullmatch(r":?-{3,}:?", c) for c in cells if c):
            continue
        if in_extension:
            extension += 1
        else:
            parity += 1

    print(json.dumps({
        "parity": parity,
        "extension": extension,
        "total": parity + extension,
        "source": path,
    }))


if __name__ == "__main__":
    main()
