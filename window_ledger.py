"""Driver-coverage ledger (VERDICT r10 task 3).

The driver verifies only the first 50 registered queries each round
("the window"); the rest rely on pytest oracle parity. Rotation debt —
which families have NEVER had a driver-verified row — was previously
prose-tracked in SURVEY.md. This module derives it from artifacts
instead:

- `__spark_entry__.queries()` / `oracle_sql()`  -> registration order,
  current window, oracle backing;
- `__spark_entry__.ROTATIONS`                   -> executed slot swaps
  (round, out, in) since r9, when rotation moved from file placement to
  `_rotate_slot`;
- `CORRECTNESS_r*.json`                         -> per round, which keys
  the driver actually checked and whether rows+schema+hash were green.

`build_ledger()` returns one record per registered query plus a summary;
`python window_ledger.py` prints the backlog + summary as markdown.
`tests/test_window_ledger.py` asserts the invariants every round.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.abspath(__file__))
WINDOW_SIZE = 50


def load_correctness(repo: str = REPO) -> dict[int, dict]:
    """{round -> {query -> row-dict}} from every CORRECTNESS_r*.json."""
    out: dict[int, dict] = {}
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        with open(p) as f:
            out[int(m.group(1))] = json.load(f)
    return out


def _green(row: dict) -> bool:
    return bool(row.get("rows_match")) and bool(row.get("schema_match")) \
        and bool(row.get("hash_match")) and not row.get("err")


def build_ledger(repo: str = REPO) -> dict:
    import __spark_entry__ as entry

    names = list(entry.queries())
    oracles = entry.oracle_sql()
    window = names[:WINDOW_SIZE]
    correctness = load_correctness(repo)

    rows = {}
    for n in names:
        seen = sorted(r for r, d in correctness.items() if n in d)
        green = sorted(r for r, d in correctness.items()
                       if n in d and _green(d[n]))
        rows[n] = {
            "in_window_now": n in window,
            "oracle_backed": n in oracles,
            "rounds_seen": seen,
            "rounds_green": green,
            "last_green": green[-1] if green else None,
        }

    backlog = [n for n in names if not rows[n]["rounds_seen"]
               and not rows[n]["in_window_now"]]
    # VERDICT r14 task 8: "ever_driver_seen" hides staleness — a row
    # greened once at r6 and evicted since carries a 9-round-old
    # attestation. Surface last_green per row so stale greens can be
    # re-prioritized once the never-seen backlog drains.
    latest = max(correctness) if correctness else 0
    stale = sorted(
        (n for n in names
         if rows[n]["last_green"] is not None
         and not rows[n]["in_window_now"]
         and latest - rows[n]["last_green"] >= 3),
        key=lambda n: rows[n]["last_green"])
    summary = {
        "registered": len(names),
        "oracle_backed": len(oracles),
        "window_size": len(window),
        "window_oracle_backed": sum(1 for n in window if n in oracles),
        "ever_driver_seen": sum(1 for n in names if rows[n]["rounds_seen"]),
        "never_driver_seen_backlog": len(backlog),
        "latest_round": max(correctness) if correctness else None,
        "stale_greens": len(stale),
    }
    return {"rows": rows, "window": window, "backlog": backlog,
            "stale": stale,
            "rotations": list(entry.ROTATIONS), "summary": summary}


def main() -> None:
    led = build_ledger()
    s = led["summary"]
    print("# Driver-coverage ledger\n")
    print("| metric | value |\n|---|---|")
    for k, v in s.items():
        print(f"| {k} | {v} |")
    print("\n## Executed rotations (r9+)\n")
    print("| round | out | in |\n|---|---|---|")
    for rnd, out, inn in led["rotations"]:
        print(f"| r{rnd} | {out} | {inn} |")
    print("\n## Never-driver-verified backlog "
          f"({s['never_driver_seen_backlog']})\n")
    for n in led["backlog"]:
        tag = "oracle" if led["rows"][n]["oracle_backed"] else "rows-only"
        print(f"- {n} ({tag})")
    print("\n## Stale greens (last driver-green >= 3 rounds ago, "
          f"now below window) ({s['stale_greens']})\n")
    print("| query | last green | rounds stale |\n|---|---|---|")
    latest = s["latest_round"] or 0
    for n in led["stale"]:
        lg = led["rows"][n]["last_green"]
        print(f"| {n} | r{lg} | {latest - lg} |")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closing the pipe is fine
        pass
