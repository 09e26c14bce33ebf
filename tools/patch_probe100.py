#!/usr/bin/env python3
"""Patch the PROBE100 standing table in STATUS.md from ScaleProbe log(s).

Usage: python3 tools/patch_probe100.py LOG [LOG...]

Parses every `name base_s x10_s ratio base_rows x10_rows` row from the
given logs (later logs override earlier rows of the same name, so a
targeted PROBE_ONLY follow-up can append/refresh rows), rewrites the
table between the PROBE100 markers in log order, and annotates the
cache-amortized `mm_*_near_dup` rows with the same † legend the
generated BENCH_10X table carries.
"""
import re
import sys

CACHE_AMORTIZED = {"mm_video_near_dup", "mm_mp4_near_dup",
                   "web_link_graph", "web_host_rank"}
LEGEND = ("† reads the session-cached pair graph priced in its `*_dedup` "
          "sibling — the operator's true cost and scale evidence are the "
          "`mm_*_pairs_build` cold rows.")

rows = {}
order = []
for log in sys.argv[1:]:
    for line in open(log, encoding="utf-8"):
        m = re.match(
            r"^(\w+)\s+(\d+\.\d+)\s+(\d+\.\d+)\s+(\d+\.\d+)\s+(\d+)\s+(\d+)\s*$",
            line)
        if not m:
            continue
        name = m.group(1)
        if name not in rows:
            order.append(name)
        rows[name] = m.groups()

if not rows:
    sys.exit("no probe rows found in the given logs")

body = ["| query | 10× (s) | 100× (s) | ratio | rows 10× → 100× |",
        "|---|---|---|---|---|"]
for name in order:
    _, tb, tx, ratio, nb, nx = rows[name]
    label = f"{name} †" if name in CACHE_AMORTIZED else name
    body.append(f"| {label} | {tb} | {tx} | {ratio} | "
                f"{int(nb):,} → {int(nx):,} |")
body += ["", LEGEND]
table = "\n".join(body)

p = "STATUS.md"
md = open(p, encoding="utf-8").read()
begin, end = "<!-- PROBE100_BEGIN -->", "<!-- PROBE100_END -->"
b, e = md.index(begin), md.index(end)
open(p, "w", encoding="utf-8").write(
    md[: b + len(begin)] + "\n" + table + "\n" + md[e:])
print(f"patched {len(order)} rows")
