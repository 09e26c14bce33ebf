#!/usr/bin/env python3
"""Emit the STATUS.md PROBE100 standing table as probe-log rows.

tools/patch_probe100.py rebuilds the table from ONLY the logs it is
given, so a targeted SPARK_GRAFT_PROBE_ONLY refresh would drop every
standing row. Pipe this script's output to a file and pass it as the
FIRST log (new probe logs after it override same-name rows):

    python3 tools/probe100_standing_log.py > /tmp/standing.log
    python3 tools/patch_probe100.py /tmp/standing.log /tmp/r14_probe100.log
"""
import re
import sys

md = open("STATUS.md", encoding="utf-8").read()
begin, end = "<!-- PROBE100_BEGIN -->", "<!-- PROBE100_END -->"
block = md[md.index(begin) + len(begin): md.index(end)]
bad = 0
for line in block.splitlines():
    m = re.match(
        r"^\|\s*(\w+)(?:\s*†)?\s*\|\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|"
        r"\s*([\d.]+)\s*\|\s*([\d,]+)\s*→\s*([\d,]+)\s*\|$", line)
    if not m:
        # A data row that fails to parse would silently VANISH from the
        # rebuilt table — the exact loss this script exists to prevent.
        # Header / separator rows are structural, everything else that
        # starts with '|' is a standing row and must round-trip.
        if line.startswith("|") and not re.match(
                r"^\|\s*(query\s*\||[-: ]+\|)", line):
            print(f"probe100_standing_log: UNPARSED standing row "
                  f"(would be dropped): {line!r}", file=sys.stderr)
            bad += 1
        continue
    name, tb, tx, ratio, nb, nx = m.groups()
    print(f"{name} {tb} {tx} {ratio} "
          f"{nb.replace(',', '')} {nx.replace(',', '')}")
if bad:
    sys.exit(1)
