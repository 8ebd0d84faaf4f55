#!/usr/bin/env python
"""Propose the round-N+1 driver-window rotation.

    python tools/propose_rotation.py [CORRECTNESS_r04.json ...]

The round driver verifies only the FIRST 50 ``queries()`` entries.
contract.py orders them via three lists (_WINDOW_FIRST /
_WINDOW_MIDDLE / _WINDOW_LAST, see contract.py's ordering comment).
This tool reads every CORRECTNESS_r*.json given (default: all in the
repo root) and prints ready-to-paste list contents for the next round:

- FIRST  <- queries with NO green row in ANY round (never verified),
            then queries whose last green row is oldest;
- LAST   <- queries green in >= 3 rounds (re-verifying is the least
            informative use of the window);
- MIDDLE <- everything else, most-recently-verified last.

It NEVER edits contract.py — the next-round session reviews the
proposal (new queries registered later auto-sort into the window when
left out of the lists, so keep genuinely new work unlisted).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def green_rounds() -> dict[str, list[int]]:
    """query -> sorted round numbers with a non-error CORRECTNESS row."""
    paths = sys.argv[1:] or sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json")))
    seen: dict[str, list[int]] = {}
    for p in paths:
        rnd = int("".join(ch for ch in Path(p).stem if ch.isdigit()) or 0)
        data = json.loads(Path(p).read_text())
        rows = data.get("queries", data) if isinstance(data, dict) else data
        if isinstance(rows, dict):
            rows = [dict(name=k, **(v if isinstance(v, dict) else {})) for k, v in rows.items()]
        for row in rows:
            name = row.get("name") or row.get("query")
            if not name:
                continue
            err = row.get("err") or row.get("error")
            if err or row.get("rows_match") is False or row.get("hash_match") is False:
                continue
            seen.setdefault(name, []).append(rnd)
    return {k: sorted(v) for k, v in seen.items()}


def main() -> None:
    import __spark_entry__ as e

    ordered = list(e.queries().keys())
    greens = green_rounds()
    never = [q for q in ordered if q not in greens]
    last_green = {q: rs[-1] for q, rs in greens.items()}
    thrice = [q for q in ordered if len(greens.get(q, [])) >= 3]
    middle = [q for q in ordered if q not in never and q not in thrice]
    # stale-first within each bucket
    middle.sort(key=lambda q: last_green.get(q, -1))
    print(f"# window budget: 50 | total queries: {len(ordered)}")
    print(f"# never driver-verified: {len(never)} | thrice-green: {len(thrice)}")
    print("\n_WINDOW_FIRST = [  # never verified, registration order")
    for q in never:
        print(f'    "{q}",')
    print("]\n\n_WINDOW_MIDDLE = [  # stale-first (last green round shown)")
    for q in middle:
        print(f'    "{q}",  # r{last_green[q]}')
    print("]\n\n_WINDOW_LAST = [  # >=3 green rounds")
    for q in thrice:
        print(f'    "{q}",  # {greens[q]}')
    print("]")
    n_window = min(50, len(ordered))
    covered = never + middle[: max(0, n_window - len(never))]
    print(f"\n# next round's window would verify: {len(covered[:50])} queries,")
    print(f"# of which never-verified: {len([q for q in covered[:50] if q in never])}")


if __name__ == "__main__":
    main()
