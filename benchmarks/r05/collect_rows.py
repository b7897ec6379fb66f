"""Collect the round-5 device rows from the bench logs into
``BENCHMARKS_r05.json`` (one JSON object per line, like the r03/r04
artifacts).  Run after the device wave:

    python benchmarks/r05/collect_rows.py /tmp/r05_*.log
"""

import json
import sys

rows = []
for path in sys.argv[1:]:
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        r = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "metric" in r:  # labeled rows only
                        rows.append(r)
    except OSError:
        print(f"skip {path}", file=sys.stderr)

seen = {}
for r in rows:
    # last occurrence of a metric wins (reruns supersede)
    seen[json.dumps(r, sort_keys=True)] = r
out = "/root/repo/BENCHMARKS_r05.json"
with open(out, "w") as f:
    for r in seen.values():
        f.write(json.dumps(r) + "\n")
print(f"{len(seen)} rows -> {out}")
