"""Per-file on-chip test sweep driver (r4 verdict item 5: finish the
on-chip ledger). Runs each tests/*.py on the real TPU chip via
tests/run_tpu_suite.py (persistent compile cache on), with a per-file
timeout, and appends one JSON line per file to ONCHIP_LEDGER.jsonl.

Usage: python benchmarks/scratch/onchip_sweep.py [file ...]
       (no args = every tests/test_*.py not yet in the ledger)
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LEDGER = os.path.join(REPO, "ONCHIP_LEDGER.jsonl")
PER_FILE_TIMEOUT = 2400  # s


def done_files():
    out = set()
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("status") == "pass":
                    out.add(rec["file"])
    return out


def main():
    targets = sys.argv[1:]
    if not targets:
        alldone = done_files()
        targets = sorted(
            f"tests/{p}" for p in os.listdir(os.path.join(REPO, "tests"))
            if re.match(r"test_.*\.py$", p) and f"tests/{p}" not in alldone
        )
    for t in targets:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "tests/run_tpu_suite.py"), t],
                capture_output=True, text=True, timeout=PER_FILE_TIMEOUT,
                cwd=REPO,
            )
            tail = (proc.stdout or "")[-4000:]
            m = re.search(
                r"(\d+) passed(?:, (\d+) skipped)?(?:, (\d+) xfailed)?", tail
            )
            fail = re.search(r"(\d+) (?:failed|error)", tail)
            rec = {
                "file": t,
                "status": (
                    "fail" if (fail or proc.returncode not in (0, 5))
                    else "pass"
                ),
                "passed": int(m.group(1)) if m else 0,
                "skipped": int(m.group(2) or 0) if m else 0,
                "seconds": round(time.time() - t0, 1),
            }
            if fail:
                rec["failed"] = int(fail.group(1))
                rec["tail"] = tail[-1500:]
        except subprocess.TimeoutExpired:
            rec = {"file": t, "status": "timeout",
                   "seconds": round(time.time() - t0, 1)}
        with open(LEDGER, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps({k: v for k, v in rec.items() if k != "tail"}),
              flush=True)


if __name__ == "__main__":
    main()
