"""Validate a committed SELFCHECK artifact: for EVERY section, the number
of printed ``PASS``/``FAIL``/``ROWS`` result lines must equal the footer's
``N pass, N fail, N rows-only`` sum, and the tool's own
``SELFCHECK-VALID printed=X expected=Y MATCH`` line must be present and
MATCH. Round 4 committed an artifact whose footers said 330/0/12 while
~20 result lines per section had been lost to interleaved unflushed
streams — this check makes that class of silently-unauditable evidence a
hard failure before the file can ship.

Usage: python tools/check_selfcheck_artifact.py SELFCHECK_rN.txt
Exit 0 iff every section is internally consistent and has 0 fails.
"""

from __future__ import annotations

import re
import sys


def validate(path: str) -> int:
    sections: list[dict] = []
    cur = None
    with open(path, errors="replace") as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("== "):
                cur = {"title": line, "pass": 0, "fail": 0, "rows": 0,
                       "footer": None, "valid": None}
                sections.append(cur)
                continue
            if cur is None:
                continue
            if line.startswith("PASS  "):
                cur["pass"] += 1
            elif line.startswith("FAIL  "):
                cur["fail"] += 1
            elif line.startswith("ROWS  "):
                cur["rows"] += 1
            else:
                m = re.match(r"(\d+) pass, (\d+) fail, (\d+) rows-only", line)
                if m:
                    cur["footer"] = tuple(int(g) for g in m.groups())
                m = re.match(r"SELFCHECK-VALID printed=(\d+) expected=(\d+) (\w+)",
                             line)
                if m:
                    cur["valid"] = (int(m.group(1)), int(m.group(2)), m.group(3))

    if not sections:
        print(f"{path}: no '== section ==' headers found")
        return 1
    rc = 0
    for s in sections:
        counted = (s["pass"], s["fail"], s["rows"])
        problems = []
        if s["footer"] is None:
            problems.append("missing footer line")
        elif counted != s["footer"]:
            problems.append(f"printed lines {counted} != footer {s['footer']}")
        if s["valid"] is None:
            problems.append("missing SELFCHECK-VALID line")
        elif s["valid"][2] != "MATCH" or s["valid"][0] != s["valid"][1]:
            problems.append(f"SELFCHECK-VALID says {s['valid']}")
        if s["fail"]:
            problems.append(f"{s['fail']} FAIL lines")
        status = "OK" if not problems else "BAD"
        print(f"{status}  {s['title']}: printed {counted}, footer {s['footer']}, "
              f"valid {s['valid']}" + ("; ".join([""] + problems)))
        if problems:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(validate(sys.argv[1] if len(sys.argv) > 1
                              else "SELFCHECK.txt"))
