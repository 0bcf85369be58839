#!/usr/bin/env python3
"""Split an `sbt runMain graft.Bench` log (SPARK_GRAFT_EXPLAIN=1) into
per-query plan files.

Usage: split_plans.py <sbt_log> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for the FIRST plan printed per query
(the damper's extra runs re-print identical plans). The log interleaves the
`== <name>` stderr markers ([error] lines) with the explain("formatted")
stdout body ([info] lines); Spark's own log4j noise is [error]-prefixed and
drops out, sbt's metric JSON lines are filtered explicitly.
"""
import re, sys, os

log, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)

cur = None          # query name being captured
buf = []
seen = set()
def flush():
    global cur, buf
    if cur and cur not in seen and buf:
        seen.add(cur)
        with open(f"{outdir}/{cur}_{suffix}.txt", "w") as f:
            f.write("\n".join(buf).rstrip() + "\n")
    cur, buf = None, []

for line in open(log, errors="replace"):
    line = line.rstrip("\n")
    m = re.match(r"\[error\] == (q\w+)$", line)
    if m:
        flush()
        cur = m.group(1)
        continue
    if cur is None:
        continue
    if line.startswith("[info] "):
        body = line[7:]
        if body.startswith('{"metric"') or body.startswith("[success]"):
            flush()
            continue
        buf.append(body)
    elif line.startswith("[info]"):
        buf.append("")
flush()
print("wrote:", sorted(seen))
