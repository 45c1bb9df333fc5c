"""Regenerate PARITY.md's on-chip ledger summary table from
ONCHIP_LEDGER.jsonl (latest record per file wins). Idempotent: replaces
everything after the <!-- ONCHIP_LEDGER_SUMMARY --> marker up to the next
heading (or EOF)."""
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LEDGER = os.path.join(REPO, "ONCHIP_LEDGER.jsonl")
PARITY = os.path.join(REPO, "PARITY.md")
MARKER = "<!-- ONCHIP_LEDGER_SUMMARY -->"


def main():
    latest = {}
    with open(LEDGER) as f:
        for line in f:
            rec = json.loads(line)
            latest[rec["file"]] = rec  # later lines override earlier ones

    rows = []
    n_pass = n_fail = n_other = 0
    for fname in sorted(latest):
        r = latest[fname]
        st = r["status"]
        if st == "pass":
            n_pass += 1
            status = f"pass ({r['passed']}" + (
                f", {r['skipped']} skipped)" if r.get("skipped") else ")"
            )
        elif st == "fail":
            n_fail += 1
            status = f"FAIL ({r.get('failed', '?')} of {r.get('passed', 0) + r.get('failed', 0)})"
        else:
            n_other += 1
            status = st
        rows.append(
            f"| `{fname}` | {status} | {round(r.get('seconds', 0))} s |"
        )

    table = "\n".join(
        [
            f"{len(latest)} of the 41 test files recorded on the real chip: "
            f"**{n_pass} pass**, {n_fail} fail, {n_other} other.",
            "",
            "| File | On-chip result | Wall |",
            "|---|---|---|",
            *rows,
            "",
        ]
    )

    with open(PARITY) as f:
        text = f.read()
    head, _, tail = text.partition(MARKER)
    # keep anything from the next markdown heading onward
    m = re.search(r"\n#{1,6} ", tail)
    rest = tail[m.start() :] if m else "\n"
    with open(PARITY, "w") as f:
        f.write(head + MARKER + "\n\n" + table + rest)
    print(f"wrote {len(latest)} rows ({n_pass} pass / {n_fail} fail / {n_other} other)")


if __name__ == "__main__":
    main()
