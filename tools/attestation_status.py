"""Attestation ledger: which registry ops have a driver CORRECTNESS row.

Reads every CORRECTNESS_r*.json in the repo root plus the staged
_PRIORITY_R* windows and prints:

- cumulative driver-attested ops (and how many of those are currently
  green vs ever-red),
- ops staged in a not-yet-run window,
- the never-attested remainder in registry order (the candidate pool
  for the next staging pass).

Usage: PYTHONPATH=/root/repo python tools/attestation_status.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Ledger rows whose op name no longer exists in the registry, with the
# reason. These are EXPLAINED residue — the driver row happened, the op
# was renamed/superseded afterwards — not defects; the ledger counts
# them but never flags them, so audits stop re-deriving why the
# cumulative attested count exceeds the green-name count.
RETIRED: dict[str, str] = {
    "multimodal_decode_stub": (
        "r2 placeholder superseded by multimodal_decode; name retired"
    ),
}


def main() -> int:
    import my_polars_ai_spark.operators as reg
    from my_polars_ai_spark.operators import all_ops

    ops = list(all_ops())
    attested: dict[str, bool] = {}  # name -> last driver row green?
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(f)).items():
            ok = all(
                row.get(k) in (True, None)
                for k in ("rows_match", "schema_match", "hash_match")
            ) and row.get("err") in (None, "")
            attested[name] = ok
    # Pending = the LIVE window (the driver runs it this round) plus
    # every staged window numbered past the last CORRECTNESS round;
    # historical windows already have their rows in CORRECTNESS files
    # and must not count as pending.
    last_run = max(
        (
            int(m.group(1))
            for f in glob.glob(
                os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")
            )
            if (m := re.search(r"r(\d+)", os.path.basename(f)))
        ),
        default=0,
    )
    staged: set[str] = set(reg._PRIORITY)
    for attr in dir(reg):
        m = re.fullmatch(r"_PRIORITY_R(\d+)", attr)
        if m and int(m.group(1)) > last_run:
            staged |= set(getattr(reg, attr))
    staged -= set(attested)
    never = [o for o in ops if o not in attested and o not in staged]
    greens = sum(attested.values())
    print(f"registry ops:            {len(ops)}")
    print(f"driver-attested (cum.):  {len(attested)}  ({greens} green on last row)")
    renamed = sorted(set(attested) - set(ops))
    for n in renamed:
        if n in RETIRED:
            print(f"  retired name (explained): {n} — {RETIRED[n]}")
    unexplained = [n for n in renamed if n not in RETIRED]
    if unexplained:
        print(f"  UNEXPLAINED attested-but-unregistered names: {unexplained}")
    reds = sorted(n for n, ok in attested.items() if not ok and n in ops)
    if reds:
        # NOTE: rows-only sketches attested before they gained oracles
        # keep their old red row until their next window slot — check
        # the op's tags before treating a red as a live defect.
        print(f"  last-row RED (want a re-attest slot): {reds}")
    print(f"staged, not yet run:     {len(staged)}")
    print(f"never attested/staged:   {len(never)}")
    for n in never:
        print(f"  - {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
