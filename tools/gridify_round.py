"""r9 second pass: convert remaining ROUND-over-division sites (mid-
plan derived means/ratios used as keys or intermediates) to the
engine-identical grid FLOOR(x*10^k + 0.5)/10^k. ROUND-then-DECIMAL of
a derived double double-rounds differently in DuckDB (double ROUND,
then decimal recast) than in Spark (BigDecimal-of-shortest-repr
HALF_UP); FLOOR over identical IEEE doubles cannot disagree.

Converts a site when its expr contains a TOP-LEVEL division. Raw-
column quantizers (ROUND(value, 2)) and exact-decimal identities are
left alone. Both languages are converted independently — the
transformation is value-preserving except on the exact ties that were
the bug.

Usage: python tools/gridify_round.py [--apply] file...
"""
from __future__ import annotations

import sys
from pathlib import Path

from round_audit import find_calls
from retire_round import _split_args


def top_level_div(expr: str) -> bool:
    depth = 0
    for ch in expr:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "/" and depth == 0:
            return True
    return False


ALL_MODE = False


def convert(text: str):
    edits = []
    for s, e in find_calls(text, "F.round("):
        inner = text[s + len("F.round("):e - 1]
        expr, dig = _split_args(inner)
        if dig is None:
            if not ALL_MODE:
                continue
            dig = "0"
        if not dig.strip().isdigit():
            continue
        if not ALL_MODE and not top_level_div(expr):
            continue
        k = int(dig)
        ex = expr.strip()
        import re as _re
        if _re.fullmatch(r'["\'][A-Za-z_]\w*["\']', ex):
            ex = f"col({ex})"
        if k == 0:
            rep = f"F.floor(({ex}) + F.lit(0.5))"
        else:
            rep = (f"(F.floor(({ex}) * F.lit(1e{k}) + F.lit(0.5))"
                   f" / F.lit(1e{k}))")
        edits.append((s, e, rep))
    for s, e in find_calls(text, "ROUND("):
        if text[max(0, s - 2):s] == "F.":
            continue
        inner = text[s + len("ROUND("):e - 1]
        expr, dig = _split_args(inner)
        if dig is None:
            if not ALL_MODE:
                continue
            dig = "0"
        if not dig.strip().isdigit():
            continue
        if not ALL_MODE and not top_level_div(expr):
            continue
        k = int(dig)
        if k == 0:
            rep = f"FLOOR(({expr.strip()}) + 0.5)"
        else:
            rep = f"FLOOR(({expr.strip()}) * 1e{k} + 0.5) / 1e{k}"
        edits.append((s, e, rep))
    # apply only edits not nested inside another edit's span — inner
    # ROUNDs are picked up on the next fixpoint iteration
    outer = [x for x in edits
             if not any(s2 <= x[0] and x[1] <= e2 for s2, e2, _ in edits
                        if (s2, e2) != (x[0], x[1]))]
    for s, e, rep in sorted(outer, reverse=True):
        text = text[:s] + rep + text[e:]
    return text, len(outer)


def convert_fixpoint(text: str):
    total = 0
    while True:
        text, n = convert(text)
        if not n:
            return text, total
        total += n


if __name__ == "__main__":
    apply = "--apply" in sys.argv
    if "--all" in sys.argv:
        globals()["ALL_MODE"] = True
    base = Path(__file__).resolve().parent.parent / "biosets_spark"
    total = 0
    for f in [a for a in sys.argv[1:] if not a.startswith("--")]:
        p = base / f if not f.startswith("/") else Path(f)
        t = p.read_text()
        nt, n = convert_fixpoint(t)
        total += n
        if n:
            print(f"{p.name}: {n} sites")
            if apply:
                p.write_text(nt)
    print("total:", total)
