"""r9: retire output-layer ROUND-over-derived-double sites (VERDICT r8
task #2). For each @q block in a queries*.py file, find paired sites:

  Spark:  F.round(EXPR, k).alias("name")   ->  (EXPR).alias("name")
  SQL:    ROUND(EXPR, k) AS name           ->  (EXPR) AS name

A pair is transformed only when BOTH sides exist for the same column
name and the name is not referenced as a key (GROUP BY / ON / WHERE /
HAVING / PARTITION BY) elsewhere in the oracle SQL — key-layer
rounding aligns the two engines and must stay. Input quantizers
(ROUND(...)::DECIMAL inside exact sums) are never touched.

Usage:
  python tools/retire_round.py --list  file.py     # dry-run report
  python tools/retire_round.py --apply file.py
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

from round_audit import find_calls


def _split_args(inner: str):
    """Split 'EXPR, k' at the top-level comma (last one). A trailing
    top-level comma (multiline call style) is stripped first."""
    inner = inner.rstrip()
    if inner.endswith(","):
        inner = inner[:-1].rstrip()
    depth = 0
    last = None
    for i, ch in enumerate(inner):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            last = i
    if last is None:
        return inner, None
    return inner[:last], inner[last + 1:].strip()


def spark_sites(block: str):
    """Yield (start, end, expr, digits, name) for F.round(...).alias("name")."""
    for s, e in find_calls(block, "F.round("):
        m = re.match(r'\s*\.alias\(\s*["\']([A-Za-z_]\w*)["\']\s*\)', block[e:])
        if not m:
            continue
        inner = block[s + len("F.round("):e - 1]
        expr, digits = _split_args(inner)
        yield s, e, expr.strip(), digits, m.group(1)


def sql_sites(block: str):
    """Yield (start, end, expr, digits, name) for ROUND(...) AS name,
    excluding CAST(ROUND(...) AS DECIMAL quantizers."""
    for s, e in find_calls(block, "ROUND("):
        if block[max(0, s - 2):s] == "F.":
            continue
        if re.search(r'CAST\(\s*$', block[max(0, s - 12):s]):
            continue
        m = re.match(r'\s+AS\s+([A-Za-z_]\w*)', block[e:])
        if not m:
            continue
        inner = block[s + len("ROUND("):e - 1]
        expr, digits = _split_args(inner)
        yield s, e, expr.strip(), digits, m.group(1)


_KEY_USE = r'(GROUP\s+BY|PARTITION\s+BY|\bON\b|\bWHERE\b|\bHAVING\b|\bUSING\b|\bJOIN\b)'


def name_is_key(sql: str, name: str, as_site_end: int) -> bool:
    """True if `name` is referenced after a key-context keyword on any
    line of the SQL (conservative: any GROUP BY/ON/WHERE/HAVING/
    PARTITION BY clause mentioning the name)."""
    for m in re.finditer(rf'\b{re.escape(name)}\b', sql):
        head = sql[:m.start()]
        # nearest preceding clause keyword on the same statement chunk
        kws = list(re.finditer(
            r'\b(SELECT|FROM|GROUP\s+BY|ORDER\s+BY|PARTITION\s+BY|WHERE|HAVING|ON|USING|JOIN|AS)\b',
            head, re.I))
        if not kws:
            continue
        last = kws[-1].group(1).upper().replace("  ", " ")
        if last in ("GROUP BY", "PARTITION BY", "WHERE", "HAVING", "ON",
                    "USING", "JOIN"):
            return True
    return False


def transform_block(block: str):
    """Return (new_block, applied_names, skipped) for one @q block."""
    sp = list(spark_sites(block))
    sq = list(sql_sites(block))
    sp_names = {n for *_, n in sp}
    sq_names = {n for *_, n in sq}
    paired = sp_names & sq_names
    applied, skipped = [], []
    edits = []  # (start, end_incl_alias, replacement)
    for name in sorted(paired):
        sp_n = [t for t in sp if t[4] == name]
        sq_n = [t for t in sq if t[4] == name]
        if len(sp_n) != 1 or len(sq_n) != 1:
            skipped.append((name, "multi-site"))
            continue
        msql = re.search(r'oracle\s*=\s*"""(.*?)"""', block, re.S)
        sql = msql.group(1) if msql else block
        if name_is_key(sql, name, 0):
            skipped.append((name, "key-use"))
            continue
        s, e, expr, dig, _ = sp_n[0]
        if re.fullmatch(r'["\'][A-Za-z_]\w*["\']', expr):
            edits.append((s, e, f"col({expr})"))
        else:
            edits.append((s, e, f"({expr})"))
        s, e, expr, dig, _ = sq_n[0]
        edits.append((s, e, f"({expr})"))
        applied.append(name)
    for s, e, rep in sorted(edits, reverse=True):
        block = block[:s] + rep + block[e:]
    un_sp = sp_names - sq_names
    un_sq = sq_names - sp_names
    for n in sorted(un_sp):
        skipped.append((n, "spark-only"))
    for n in sorted(un_sq):
        skipped.append((n, "sql-only"))
    return block, applied, skipped


def process(path: Path, apply: bool):
    text = path.read_text()
    # split into @q blocks on decorator boundaries
    idxs = [m.start() for m in re.finditer(r'^@q\(', text, re.M)]
    if not idxs:
        print(f"{path.name}: no @q blocks")
        return
    pieces = []
    bounds = idxs + [len(text)]
    pieces.append(text[:idxs[0]])
    total_applied, total_skipped = [], []
    for a, b in zip(idxs, bounds[1:]):
        block = text[a:b]
        mname = re.search(r'@q\(\s*\n?\s*["\'](q_\w+)', block)
        qname = mname.group(1) if mname else "?"
        nb, applied, skipped = transform_block(block)
        if applied:
            total_applied.append((qname, applied))
        for n, why in skipped:
            if why != "key-use" or True:
                total_skipped.append((qname, n, why))
        pieces.append(nb if apply else block)
    out = "".join(pieces)
    for qname, names in total_applied:
        print(f"  APPLY {qname}: {', '.join(names)}")
    for qname, n, why in total_skipped:
        print(f"  skip  {qname}.{n}: {why}")
    if apply and out != text:
        path.write_text(out)
        print(f"{path.name}: WROTE ({sum(len(n) for _, n in total_applied)} sites)")
    else:
        print(f"{path.name}: {'no changes' if apply else 'dry run'}")
    return [q for q, _ in total_applied]


if __name__ == "__main__":
    apply = "--apply" in sys.argv
    files = [a for a in sys.argv[1:] if not a.startswith("--")]
    base = Path(__file__).resolve().parent.parent / "biosets_spark"
    affected = []
    for f in files:
        p = base / f if not f.startswith("/") else Path(f)
        r = process(p, apply)
        if r:
            affected.extend(r)
    if affected:
        print("affected queries:", " ".join(sorted(set(affected))))
