"""Attestation ledger: which registry ops have a driver CORRECTNESS row.

Reads every CORRECTNESS_r*.json in the repo root plus the staged
_PRIORITY_R* windows and prints:

- cumulative driver-attested ops (and how many of those are currently
  green vs ever-red),
- ops staged in a not-yet-run window,
- the never-attested remainder in registry order (the candidate pool
  for the next staging pass).

Usage: PYTHONPATH=/root/repo python tools/attestation_status.py [--endgame]

``--endgame`` (round-12 groundwork for the post-R13 contract): once the
R13 window has run, every registry op has a driver row and the ledger's
headline becomes FRESHNESS, not coverage. The flag asserts exactly
that and exits non-zero otherwise:

- zero never-attested ops and zero ops still waiting on a staged
  window (i.e. cumulative attested == registry) — EXCEPT ops pending
  in the LIVE window, which are sanctioned (round 14): a consumer
  registered this round attests at this round's driver run, the
  earliest schedule possible; only an op parked in a LATER window (or
  in none) fails the gate,
- every non-green latest row belongs to ROWS_ONLY_BY_DESIGN (the
  sketch trio whose outputs are not SQL-oracle-expressible — their
  rows-only driver check records no hash match by design),
- prints the freshness ledger: "full-registry attested; oldest row:
  rN" plus the ops holding that oldest round (the next rotation's
  natural candidates).
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

# Sketch/ML ops whose outputs are by design not SQL-oracle-expressible:
# the driver records a rows-only check for them (rows > 0, no value
# hash), so a non-green "latest row" for exactly these names is the
# expected endgame state, not a defect.
ROWS_ONLY_BY_DESIGN = frozenset(
    {"approx_distinct", "approx_quantiles", "kmeans_segments"}
)


def round_of(path: str) -> int:
    """CORRECTNESS file ordering key: the EXTRACTED round number, so
    r100 sorts after r99 (lexicographic glob order breaks at three
    digits and would pair r100's round with r99's verdict)."""
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def endgame_check(
    ops: list[str],
    latest_round: dict[str, int],
    green: dict[str, bool],
    staged_pending: set[str],
    live_window: frozenset[str] | set[str] = frozenset(),
) -> tuple[bool, str]:
    """The post-R13 ledger contract, pure so tests can pin it.

    Returns (ok, report). ok only when every registry op has a driver
    row, nothing is still waiting on a staged window, and every
    non-green latest row is a ROWS_ONLY_BY_DESIGN sketch.

    Round-14 evolution (the new-op rule meets the standing gate): a
    pending op that sits in the LIVE window is SANCTIONED — it is a
    consumer added this round, and its first driver row lands at the
    very next driver run, which is the strongest schedule an op
    without a time machine can have. A pending op NOT in the live
    window is parked and still fails: that is the regression this
    gate exists to catch (an op registered without a next-run slot)."""
    missing = [o for o in ops if o not in latest_round and o not in staged_pending]
    sanctioned = sorted(staged_pending & set(live_window))
    parked = sorted(staged_pending - set(live_window))
    bad_red = sorted(
        n for n, g in green.items() if not g and n in ops and n not in ROWS_ONLY_BY_DESIGN
    )
    lines = []
    ok = not missing and not parked and not bad_red
    if missing:
        lines.append(f"NOT at endgame: {len(missing)} ops never attested: {missing[:10]}")
    if parked:
        lines.append(
            f"NOT at endgame: {len(parked)} ops waiting on a staged window "
            f"that is not the live one: {parked[:10]}"
        )
    if sanctioned:
        lines.append(
            f"{len(sanctioned)} new op(s) pending in the LIVE window "
            f"(first row lands at this round's driver run): {sanctioned}"
        )
    if bad_red:
        lines.append(f"NOT at endgame: non-green latest rows outside the sketch trio: {bad_red}")
    if ok:
        rowed = [o for o in ops if o in latest_round]
        oldest = min(latest_round[o] for o in rowed)
        holders = [o for o in rowed if latest_round[o] == oldest]
        lines.append(f"full-registry attested; oldest row: r{oldest}")
        lines.append(
            f"  {len(holders)} ops at r{oldest} (next rotation candidates): "
            + ", ".join(holders[:8])
            + ("..." if len(holders) > 8 else "")
        )
    return ok, "\n".join(lines)


def main() -> int:
    import my_polars_ai_spark.operators as reg
    from my_polars_ai_spark.operators import all_ops

    ops = list(all_ops())
    attested: dict[str, bool] = {}  # name -> last driver row green?
    latest_round: dict[str, int] = {}  # name -> last driver round
    # attested[name] keeps the verdict from the last file processed, so
    # the processing order must be round_of(), not glob order (round-12
    # advice item: lexicographic pairs r100's round with r99's verdict).
    files = sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")),
        key=round_of,
    )
    for f in files:
        rnd = round_of(f)
        for name, row in json.load(open(f)).items():
            ok = all(
                row.get(k) in (True, None)
                for k in ("rows_match", "schema_match", "hash_match")
            ) and row.get("err") in (None, "")
            attested[name] = ok
            latest_round[name] = max(latest_round.get(name, 0), rnd)
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
    if "--endgame" in sys.argv:
        ok, report = endgame_check(
            ops, latest_round, attested, staged, live_window=set(reg._PRIORITY)
        )
        print(report)
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
