"""Coverage cross-check: SURVEY.md §2.B declared query ids vs registry.

Parses every ``q_*`` id out of SURVEY.md §2.B, compares against the
live registry, and writes COVERAGE.md. Fails (exit 1) if any declared
id is missing. Run: ``python tools/coverage.py``.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.registry import REGISTRY, _load_all_modules

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def render() -> tuple[str, list[str], int, int]:
    """Build COVERAGE.md's content; returns (text, missing, declared,
    implemented) so both main() and the docs-sync freshness gate
    (tests/test_docs_sync.py) consume one source of truth."""
    with open(os.path.join(REPO, "SURVEY.md")) as f:
        survey = f.read()
    sec = survey.split("### 2.B", 1)[1].split("\n## ", 1)[0]
    declared = sorted(set(re.findall(r"\bq_[a-z0-9_]+\b", sec)))
    _load_all_modules()
    implemented = set(REGISTRY)

    # Declared ids whose registration is environment-gated (they
    # activate on clusters with the runtime dependency present).
    from iceberg_twist_spark.streaming.tws import tws_available

    env_gated = {} if tws_available() else {"q_stream_queue_tws": "needs protobuf"}

    def satisfied(q: str) -> bool:
        # A trailing underscore comes from a wildcard family row like
        # ``q_stream_*`` — satisfied by any registered id with that prefix.
        if q.endswith("_"):
            return any(n.startswith(q) for n in implemented)
        return q in implemented or q in env_gated

    missing = [q for q in declared if not satisfied(q)]
    extra = sorted(implemented - set(declared))
    with_oracle = sorted(
        n for n in implemented if REGISTRY[n].oracle is not None
    )

    lines = [
        "# COVERAGE — SURVEY.md §2.B contract vs registry",
        "",
        f"Declared in §2.B: **{len(declared)}** · implemented: "
        f"**{len(implemented)}** ({len(with_oracle)} oracle-checked, "
        f"{len(implemented) - len(with_oracle)} rows-only) · "
        f"missing: **{len(missing)}**",
        "",
        "| §2.B id | registered | oracle |",
        "|---|---|---|",
    ]
    for q in declared:
        if q in env_gated and q not in implemented:
            lines.append(f"| {q} | ○ env-gated ({env_gated[q]}) | rows-only |")
            continue
        if q.endswith("_"):
            n_fam = sum(1 for n in implemented if n.startswith(q))
            mark = f"✓ family ({n_fam} ids)" if n_fam else "✗ MISSING"
            lines.append(f"| {q}* | {mark} | — |")
            continue
        reg = q in implemented
        orc = reg and REGISTRY[q].oracle is not None
        lines.append(f"| {q} | {'✓' if reg else '✗ MISSING'} | {'✓' if orc else 'rows-only'} |")
    lines += [
        "",
        "## Implemented beyond the §2.B declaration",
        "",
    ]
    for q in extra:
        orc = REGISTRY[q].oracle is not None
        tags = ",".join(REGISTRY[q].tags)
        lines.append(f"- `{q}` ({'oracle' if orc else 'rows-only'}; {tags})")
    lines.append("")
    lines.append("Regenerate: `python tools/coverage.py` (fails if any declared id is missing).")
    lines.append("")
    return "\n".join(lines), missing, len(declared), len(implemented)


def main() -> int:
    text, missing, n_decl, n_impl = render()
    out = os.path.join(REPO, "COVERAGE.md")
    with open(out, "w") as f:
        f.write(text)
    print(f"declared={n_decl} implemented={n_impl} missing={missing or 'none'}")
    print(f"wrote {out}")
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
