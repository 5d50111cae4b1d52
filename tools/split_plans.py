#!/usr/bin/env python3
"""Split a `graft.tools.Explain` log into per-query plan files.

Usage: python3 tools/split_plans.py <explain_log> <out_dir> <suffix>

Writes <out_dir>/<query>_<suffix>.txt with the formatted physical plan of
each query (the `========== name ==========` sections of the log, WARN/INFO
noise dropped). Used to commit the round's before/after plan evidence under
plans/r<N>/.
"""
import os
import re
import sys

log, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(out_dir, exist_ok=True)

name = None
buf = []


def flush():
    if name is None:
        return
    # drop LOG lines only — anchored to the log-line prefix (timestamp +
    # level at line start), so a plan line whose column/expression name
    # happens to contain "error" etc. is kept (r13 ADVICE).
    body = [l for l in buf
            if not re.match(r"^\d\d/\d\d/\d\d \d\d:\d\d:\d\d (WARN|INFO|ERROR)\b", l)
            and not l.startswith("[")]
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write("".join(body).strip() + "\n")


for line in open(log, errors="replace"):
    m = re.match(r"=+ (\w+) =+\s*$", line)
    if m:
        flush()
        name = m.group(1)
        buf = []
    elif name is not None:
        buf.append(line)
flush()
print(f"wrote plans for suffix {suffix} to {out_dir}")
