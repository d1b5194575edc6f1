#!/usr/bin/env python3
"""Freeze the r15 mechanism-probe baselines into BenchRefs.mechRefs.

Reads a FULL bench artifact (the file written via SPARK_GRAFT_BENCH_OUT,
which carries queries_tasks / queries_gc_frac / queries_spill_mb) and
rewrites the `mechRefs` map in src/main/scala/graft/BenchRefs.scala in
place, preserving the surrounding scaladoc. Run once per re-freeze, from a
probe-clean run of record; BenchRefsSpec then enforces key consistency.

Usage: python3 tools/gen_mechrefs.py BENCH_LOCAL_r15.json
"""
import json
import re
import sys

artifact = sys.argv[1]
d = json.load(open(artifact))
tasks = d["queries_tasks"]
gc = d["queries_gc_frac"]
spill = d["queries_spill_mb"]

rows = []
for name in sorted(tasks):
    t = tasks[name]
    g = gc.get(name, 0.0)
    s = spill.get(name, 0.0)
    rows.append(f'    "{name}" -> (({t}.0, {g}, {s})),')
rows[-1] = rows[-1].rstrip(",")
body = "\n".join(rows)

path = "src/main/scala/graft/BenchRefs.scala"
src = open(path).read()
new_map = "val mechRefs: Map[String, (Double, Double, Double)] = Map(\n" + body + "\n  )"
out, n = re.subn(
    r"val mechRefs: Map\[String, \(Double, Double, Double\)\] = (Map\.empty|Map\((?:[^()]|\([^()]*\))*\))",
    new_map.replace("\\", "\\\\"), src, count=1, flags=re.S)
assert n == 1, "mechRefs map not found/replaced"
open(path, "w").write(out)
print(f"froze {len(rows)} mechanism baselines from {artifact} into {path}")
