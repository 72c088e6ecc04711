"""Interactive engine shell (A25 — the reference's command dispatcher
with prefix matching and usage text, `iceberg-twist/
serial_streaming.lua:204-261`: `e`/`en`/…/`enable` all resolve to
`enable`; ambiguous or unknown input prints usage).

Run: ``python -m iceberg_twist_spark.shell [sf_dir]`` (default
``$SPARK_GRAFT_SF_DIR`` or /root/testdata/sf0.01). Commands:

    help                 usage text
    list [substr]        registered operators (optionally filtered)
    run <query>          execute a registered query, print ≤20 rows
    explain <query>      formatted physical plan
    tables               registered table views
    sql <statement...>   run SQL over the registered views
    quit                 exit

Any unambiguous prefix works: ``l`` → list, ``ex q_topk`` → explain.
The dispatcher is a pure function over the command table so the
prefix semantics are unit-tested without a SparkSession.
"""

from __future__ import annotations

import os
import sys


def resolve(word: str, commands: list[str]) -> tuple[str | None, list[str]]:
    """Reference prefix semantics: an exact name wins outright;
    otherwise a prefix must be unambiguous. Returns (match, candidates)
    — match is None when unknown or ambiguous."""
    if word in commands:
        return word, [word]
    cands = [c for c in commands if c.startswith(word)]
    return (cands[0], cands) if len(cands) == 1 else (None, cands)


USAGE = """commands (any unambiguous prefix works):
  help                 this text
  list [substr]        registered operators
  run <query>          execute a registered query (prints <=20 rows)
  explain <query>      formatted physical plan
  tables               registered table views
  sql <statement...>   SQL over the registered views
  quit                 exit"""

COMMANDS = ["help", "list", "run", "explain", "tables", "sql", "quit"]


def dispatch(line: str, eng, out=print) -> bool:
    """Execute one shell line against an Engine-like object. Returns
    False when the session should end. ``eng`` needs: sf_dir,
    operators(), run(name), sql(stmt), and _tables (dict) — the real
    Engine and a test fake both satisfy this."""
    parts = line.strip().split()
    if not parts:
        return True
    cmd, cands = resolve(parts[0], COMMANDS)
    if cmd is None:
        if cands:
            out(f"ambiguous command '{parts[0]}': {' '.join(cands)}")
        else:
            out(f"unknown command '{parts[0]}'")
        out(USAGE)
        return True
    args = parts[1:]
    if cmd == "quit":
        return False
    if cmd == "help":
        out(USAGE)
    elif cmd == "tables":
        out(" ".join(sorted(eng._tables)))
    elif cmd == "list":
        ops = eng.operators()
        if args:
            ops = [o for o in ops if args[0] in o]
        out("\n".join(ops))
    elif cmd in ("run", "explain"):
        if not args:
            out(f"usage: {cmd} <query>")
            return True
        name, qcands = resolve(args[0], list(eng.operators()))
        if name is None:
            out(
                f"ambiguous query '{args[0]}': {' '.join(qcands[:8])}"
                if qcands
                else f"unknown query '{args[0]}'"
            )
            return True
        df = eng.run(name)
        if cmd == "explain":
            df.explain("formatted")
        else:
            df.show(20, truncate=False)
    elif cmd == "sql":
        if not args:
            out("usage: sql <statement>")
            return True
        eng.sql(" ".join(args)).show(20, truncate=False)
    return True


def main(argv: list[str] | None = None) -> int:
    from iceberg_twist_spark.api import Engine

    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    eng = Engine.local(sf_dir, app_name="itws-shell")
    print(f"iceberg-twist-spark shell — sf_dir={sf_dir}")
    print(USAGE)
    for line in sys.stdin:
        try:
            if not dispatch(line, eng):
                break
        except Exception as exc:  # noqa: BLE001 — shell survives bad input
            print(f"error: {type(exc).__name__}: {exc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
