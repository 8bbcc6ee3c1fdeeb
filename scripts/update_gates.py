"""Rebuild GATES.json from the driver's CORRECTNESS_r*.json artifacts.

For every registry entry, record the LATEST round in which the driver
gated it green (rows+schema+hash all matching, or rows-only green for
oracle-less entries) plus the git sha of the code state that gate ran
against — the parent of that round's "round N: verdict/..." artifact
commit (the end-of-round snapshot). `gate_order()` treats any entry
whose implementing modules changed since that sha as stale and
re-gates it first (VERDICT r3 #1/#7).

Run after each round's artifacts land:  python scripts/update_gates.py
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def round_shas() -> dict[int, str]:
    """round N -> sha of the code state its CORRECTNESS artifact gated
    (parent of the 'round N: verdict' commit)."""
    log = subprocess.run(
        ["git", "log", "--format=%H %P|%s"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    out: dict[int, str] = {}
    for line in log.splitlines():
        shas, _, subject = line.partition("|")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            parts = shas.split()
            if len(parts) >= 2:  # commit sha + first parent
                out[int(m.group(1))] = parts[1]
    return out


def is_green(rec: dict) -> bool:
    if rec.get("err") is not None:
        return False
    if not rec.get("rows_match"):
        return False
    # hash/schema keys absent => rows-only (oracle-less) gate: accept
    if rec.get("schema_match") is False or rec.get("hash_match") is False:
        return False
    return True


def main() -> int:
    shas = round_shas()
    entries: dict[str, dict] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        sha = shas.get(rnd)
        if sha is None:
            print(f"warn: no verdict commit found for round {rnd}; skipping", file=sys.stderr)
            continue
        data = json.loads(path.read_text())
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if is_green(rec) and rnd >= entries.get(name, {}).get("round", -1):
                entries[name] = {
                    "round": rnd,
                    "sha": sha,
                    "rows_only": "hash_match" not in rec,
                }
    # Drop names no longer in the gated registry (renamed defaults,
    # demoted diagnostics): a standing gate for a name the driver can
    # no longer run is noise, and the r11 sampled-default renames left
    # three such ghosts (VERDICT r11 "What's missing" #1).
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    current = set(entrymod.queries())
    dropped = sorted(set(entries) - current)
    entries = {k: v for k, v in entries.items() if k in current}
    # stamp the taxonomy tag (taxonomy.category_of) so gate
    # tooling and judges can reason per family straight from this file
    from milan_telecom_etl__spark.taxonomy import category_of

    for k in entries:
        entries[k]["category"] = category_of(k)
    ungated = sorted(current - set(entries))
    out = {"entries": entries, "rounds": {str(k): v for k, v in sorted(shas.items())}}
    (REPO / "GATES.json").write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"GATES.json: {len(entries)} entries across rounds {sorted(shas)}")
    if dropped:
        print(f"dropped (no longer registered): {dropped}")
    if ungated:
        print(f"registered but never driver-gated yet: {ungated}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
