"""One-command round certification (VERDICT r9, item 6): runs the
full oracle differential at sf0.001, sf0.01, and the degenerate
corpus, the plan-quality audit, and the pytest suite — then emits a
single markdown summary block for COVERAGE.md and exits non-zero if
anything is red.

Each stage is a subprocess so Spark sessions never overlap (the
stages run strictly sequentially; a shared driver JVM would let one
stage's caches/partitions contaminate the next stage's plan audit).

Usage:
  python tools/certify.py                 # all stages
  python tools/certify.py --skip-pytest   # oracle + plan audit only
  python tools/certify.py --only sf0.01   # one oracle stage

Output: the summary block on stdout AND tools/certify_out.md (the
committed copy referenced from COVERAGE.md).
"""

from __future__ import annotations

import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cmd: list[str], log_name: str) -> tuple[int, str]:
    log = Path("/tmp") / f"certify_{log_name}.log"
    t0 = time.time()
    with open(log, "w") as fh:
        rc = subprocess.call(cmd, cwd=REPO, stdout=fh,
                             stderr=subprocess.STDOUT)
    text = log.read_text()
    print(f"  [{log_name}] rc={rc} {time.time() - t0:.0f}s -> {log}",
          file=sys.stderr)
    return rc, text


def oracle_stage(sf_dir: str, label: str) -> dict:
    rc, text = run([sys.executable, "tools/check_oracle.py", sf_dir],
                   f"oracle_{label}")
    n_pass = len(re.findall(r"^PASS ", text, re.M))
    n_fail = len(re.findall(r"^FAIL ", text, re.M))
    n_skip = len(re.findall(r"^SKIP ", text, re.M))
    fails = re.findall(r"^FAIL (\S+)", text, re.M)
    return {"label": label, "pass": n_pass, "fail": n_fail, "skip": n_skip,
            "fails": fails, "rc": rc}


def main() -> int:
    argv = sys.argv[1:]
    only = argv[argv.index("--only") + 1] if "--only" in argv else None
    skip_pytest = "--skip-pytest" in argv

    stages: list[tuple[str, str]] = [
        ("/root/testdata/sf0.001", "sf0.001"),
        ("/root/testdata/sf0.01", "sf0.01"),
        ("/tmp/sftiny", "degenerate"),
    ]
    if only:
        labels = [l for _, l in stages]
        if only not in labels:
            # a typo'd --only must not run zero stages and print GREEN
            print(f"unknown --only stage {only!r}; valid: {labels}",
                  file=sys.stderr)
            return 2
        stages = [(d, l) for d, l in stages if l == only]

    results = []
    ok = True

    if any(l == "degenerate" for _, l in stages):
        rc, _ = run([sys.executable, "tools/make_degenerate.py",
                     "/tmp/sftiny"], "make_degenerate")
        ok &= rc == 0

    for sf_dir, label in stages:
        r = oracle_stage(sf_dir, label)
        results.append(r)
        ok &= r["fail"] == 0 and r["rc"] == 0

    audit_line = "skipped"
    if not only:
        rc, text = run([sys.executable, "tools/audit_plans.py"], "audit")
        n_ok = len(re.findall(r"^ok ", text, re.M))
        flagged = re.findall(r"^(?:FLAG|ERROR) (\S+)", text, re.M)
        audit_line = (f"{n_ok} clean, {len(flagged)} flagged"
                      + (f" ({flagged})" if flagged else ""))
        ok &= rc == 0 and not flagged

    pytest_line = "skipped"
    if not (skip_pytest or only):
        rc, text = run([sys.executable, "-m", "pytest", "tests/", "-q"],
                       "pytest")
        tail = [ln for ln in text.strip().splitlines()
                if re.search(r"\d+ (passed|failed)", ln)]
        pytest_line = tail[-1].strip() if tail else f"rc={rc}"
        ok &= rc == 0

    lines = ["## Certification (tools/certify.py)", ""]
    for r in results:
        extra = f" FAILS: {r['fails']}" if r["fails"] else ""
        lines.append(
            f"- oracle {r['label']}: {r['pass']} pass, {r['fail']} fail, "
            f"{r['skip']} rows-only{extra}")
    lines.append(f"- plan audit: {audit_line}")
    lines.append(f"- pytest: {pytest_line}")
    lines.append(f"- verdict: {'GREEN' if ok else 'RED'}")
    block = "\n".join(lines) + "\n"
    print(block)
    if not (only or skip_pytest):
        # only a FULL run may refresh the committed summary — a
        # partial re-check must not masquerade as certification
        (REPO / "tools" / "certify_out.md").write_text(block)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
