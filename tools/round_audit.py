"""Enumerate every F.round( / SQL ROUND( site in queries*.py and
classify by context, for the r9 ROUND-over-division retirement.

Classes:
  spark-quantizer : F.round(...).cast("decimal...  -- keep (input quantizer)
  spark-alias     : F.round(...).alias(            -- output layer, candidate
  spark-other     : anything else                  -- inspect
  sql-quantizer   : CAST(ROUND(...) AS DECIMAL     -- keep
  sql-as          : ROUND(...) AS name             -- output layer, candidate
  sql-other       : anything else                  -- inspect
"""
import re
import sys
from pathlib import Path


def find_calls(text, token):
    """Yield (start, end_of_closing_paren) for each token( with
    balanced parens. token includes the open paren, e.g. 'F.round('."""
    i = 0
    while True:
        j = text.find(token, i)
        if j < 0:
            return
        depth = 0
        k = j + len(token) - 1  # at the '('
        while k < len(text):
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        yield j, k + 1
        i = j + 1


def classify(path):
    text = Path(path).read_text()
    rows = []
    for s, e in find_calls(text, "F.round("):
        after = text[e:e + 40]
        before = text[max(0, s - 60):s]
        if re.match(r'\s*\.cast\(\s*["\']decimal', after):
            cls = "spark-quantizer"
        elif re.match(r'\s*\.alias\(', after):
            cls = "spark-alias"
        else:
            cls = "spark-other"
        line = text.count("\n", 0, s) + 1
        rows.append((cls, line, text[s:e][:90].replace("\n", " ")))
    for s, e in find_calls(text, "ROUND("):
        if text[s - 2:s].endswith("F.") or text[max(0,s-1):s].isalnum():
            continue
        after = text[e:e + 40]
        before = text[max(0, s - 30):s]
        if re.search(r'CAST\(\s*$', before) and re.match(
                r'\s+AS\s+DECIMAL', after, re.I):
            cls = "sql-quantizer"
        elif re.match(r'\s+AS\s+\w+', after) or re.match(r'\s*,', after) \
                or re.match(r'\s*$', after[:2]):
            cls = "sql-as"
        else:
            cls = "sql-other"
        line = text.count("\n", 0, s) + 1
        rows.append((cls, line, text[s:e][:90].replace("\n", " ")))
    return rows


if __name__ == "__main__":
    from collections import Counter
    base = Path(__file__).resolve().parent.parent / "biosets_spark"
    files = sorted(base.glob("queries*.py"))
    if len(sys.argv) > 1:
        files = [base / a for a in sys.argv[1:]]
    tot = Counter()
    for f in files:
        rows = classify(f)
        tot.update(c for c, _, _ in rows)
        if len(sys.argv) > 1:
            for c, ln, frag in rows:
                print(f"{f.name}:{ln}: [{c}] {frag}")
    print(dict(tot))
