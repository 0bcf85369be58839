#!/usr/bin/env python3
"""Tail-capture simulation for the bench log (r9 verdict #4).

The round driver records only the TAIL of the bench process's output —
measured 2000 chars in the r9 artifact, including sbt's "[info] "
prefixes and its trailing "[success] ..." line. r7/r8/r9 all lost part
of the name-keyed timing chunks to that window. Since r10 the bench
prints a compact positional centisecond array (metric "qcs_*") right
before the totals line; this script proves the contract:

    python3 tools/tail_check.py <bench_log> [capture_chars=2000]

1. appends a fake sbt success line (worst case for window pressure),
2. keeps only the last `capture_chars` characters,
3. reconstructs every per-query timing from the surviving qcs lines
   (order: query names sorted ascending, loader_batch_sink last — names
   from BENCH_FULL.json referenced by the totals line),
4. verifies the reconstruction matches BENCH_FULL.json exactly
   (centisecond rounding) and covers n_queries entries.

Exit 0 = every entry reconstructed from the tail alone.
"""
import json
import re
import sys


def main() -> int:
    log_path = sys.argv[1]
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    raw = open(log_path, encoding="utf-8", errors="replace").read()
    raw += "[success] Total time: 600 s (10:00), completed XXX XX, XXXX\n"
    tail = raw[-cap:]

    totals = None
    qcs_chunks = {}
    n_chunks = None
    for line in tail.splitlines():
        line = re.sub(r"^\[(info|error)\] ", "", line).strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue  # a truncated head line — expected for chunks
        m = obj.get("metric", "")
        if m == "total":
            totals = obj
        elif m.startswith("qcs_"):
            idx, total = m[len("qcs_"):].split("of")
            qcs_chunks[int(idx)] = obj["v"]
            n_chunks = int(total)

    if totals is None:
        print("FAIL: totals line not in tail")
        return 1
    if n_chunks is None or sorted(qcs_chunks) != list(range(1, n_chunks + 1)):
        print(f"FAIL: qcs chunks incomplete in tail: have {sorted(qcs_chunks)}"
              f" of {n_chunks}")
        return 1
    values = [v for i in range(1, n_chunks + 1) for v in qcs_chunks[i]]
    if len(values) != totals["n_queries"]:
        print(f"FAIL: {len(values)} values vs n_queries={totals['n_queries']}")
        return 1

    full = json.load(open(totals["full_artifact"], encoding="utf-8"))
    names = sorted(k for k in full["queries"] if k != "loader_batch_sink")
    if "loader_batch_sink" in full["queries"]:
        names.append("loader_batch_sink")
    if len(names) != len(values):
        print(f"FAIL: artifact has {len(names)} queries, tail has {len(values)}")
        return 1
    bad = []
    for name, cs in zip(names, values):
        want = full["queries"][name]
        got = "failed" if cs == -1 else cs
        want_cs = "failed" if want == "failed" else round(want * 100)
        if got != want_cs:
            bad.append((name, got, want_cs))
    if bad:
        print(f"FAIL: {len(bad)} mismatches, e.g. {bad[:5]}")
        return 1
    # r10 verdict #5: the totals line must carry the contention stamp so a
    # tail-only reader sees self-labeled contamination.
    if "contended" not in totals:
        print("FAIL: totals line missing the 'contended' stamp")
        return 1
    flag = " [CONTENDED]" if totals["contended"] else ""
    print(f"OK: all {len(values)} entries reconstructed from a {cap}-char tail"
          f" (total={totals['value']}s failed={totals['failed']}){flag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
