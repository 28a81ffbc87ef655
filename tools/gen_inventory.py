"""Generate docs/QUERY_INVENTORY.md from the live query registry.

One row per registered query: name, defining module, tags, oracle
status (full DuckDB differential vs rows-only), and the first sentence
of its description. The doc is a build artifact — regenerate with

    python tools/gen_inventory.py

and a doc-rot test (tests/test_registry.py) fails if the committed
file drifts from the registry.
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__  # noqa: E402,F401  (registers every wave)

from biosets_spark import queries as Q  # noqa: E402

HEADER = """# Query inventory

Auto-generated from the live registry (`python tools/gen_inventory.py`
— do not edit by hand). Every row is a `queries()` entry in the
driver contract; **oracle=yes** means a full DuckDB differential
(row-count + schema + value-hash) runs against it in
`tools/check_oracle.py`, **rows-only** means the weaker driver check
(non-SQL-expressible semantics, e.g. streaming twins).

"""


def first_sentence(desc: str) -> str:
    desc = " ".join(desc.split())
    m = re.search(r"(?<=[.;])\s", desc)
    return desc[: m.start()] if m else desc


def build() -> str:
    rows = []
    for name, query in Q.QUERIES.items():
        module = getattr(query.fn, "__module__", "?").replace("biosets_spark.", "")
        oracle = "yes" if query.oracle else "rows-only"
        rows.append((name, module, ",".join(query.tags), oracle,
                     first_sentence(query.desc)))

    tag_counts = Counter(t for _, _, tags, _, _ in rows for t in tags.split(",") if t)
    n_oracle = sum(1 for r in rows if r[3] == "yes")

    out = [HEADER]
    out.append(f"**{len(rows)} queries** — {n_oracle} with full DuckDB "
               f"oracles, {len(rows) - n_oracle} rows-only.\n")
    out.append("Tag counts: " + ", ".join(
        f"`{t}` {c}" for t, c in sorted(tag_counts.items())) + "\n")
    out.append("| query | module | tags | oracle | summary |")
    out.append("|---|---|---|---|---|")
    for name, module, tags, oracle, summary in sorted(rows):
        summary = summary.replace("|", "\\|")
        out.append(f"| {name} | {module} | {tags} | {oracle} | {summary} |")
    return "\n".join(out) + "\n"


def main() -> None:
    text = build()
    target = Path(__file__).resolve().parent.parent / "docs" / "QUERY_INVENTORY.md"
    target.write_text(text)
    print(f"wrote {target}")


if __name__ == "__main__":
    main()
