"""Extract per-test call durations from `tools/time_tests.sh` logs and print
tests at or above a threshold (candidates for the `slow` mark), plus the
projected fast-lane total if they were excluded."""

import pathlib
import re
import sys

LOGDIR = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/test_timings")
THRESH = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0

pat = re.compile(r"^(\d+\.\d+)s call\s+(\S+)")
rows = []
for log in sorted(LOGDIR.glob("test_*.log")):
    for line in log.read_text(errors="replace").splitlines():
        m = pat.match(line)
        if m:
            rows.append((float(m.group(1)), m.group(2)))

slow = [(d, t) for d, t in rows if d >= THRESH]
fast_total = sum(d for d, _ in rows) - sum(d for d, _ in slow)
for d, t in sorted(slow, reverse=True):
    print(f"{d:8.1f}s  {t}")
print(f"\n{len(slow)} tests >= {THRESH}s; remaining call-time if marked slow: "
      f"{fast_total:.0f}s over {len(rows) - len(slow)} tests")
