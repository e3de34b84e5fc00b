"""Per-round probe for the transformWithStateInPandas blocker.

`transformWithStateInPandas` (the one skipped pytest item,
tests/test_streaming.py) needs the google.protobuf runtime, which this
container lacks. This probe is run once per round and appends its
result to PROGRESS.jsonl so the round a runtime appears, the op gets
unskipped and slotted into that round's live window.

Usage: python tools/probe_protobuf.py [round_number]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    try:
        import google.protobuf  # noqa: F401

        available = True
        version = getattr(google.protobuf, "__version__", "unknown")
    except Exception:
        available = False
        version = None
    line = {
        "ts": time.time(),
        "probe": "google.protobuf",
        "available": available,
        "version": version,
    }
    if len(sys.argv) > 1:
        line["round"] = int(sys.argv[1])
    path = os.path.join(os.path.dirname(__file__), "..", "PROGRESS.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
