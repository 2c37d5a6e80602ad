#!/usr/bin/env python
"""Inspect / reset the bench high-water-mark file (bench.py HWM_PATH).

The bench headline fields are best-across-invocations of the SAME engine
build, keyed by source fingerprints (extraction path and analytical
suite key independently). Before trusting a record's headline fields,
verify the marks' fingerprints match the committed tree:

    python tools/bench_hwm.py --show    # marks + fingerprint match status
    python tools/bench_hwm.py --reset   # delete the marks (fresh slate)

A MISMATCH means the marks belong to a different engine build — bench.py
discards them automatically on its next run, so a mismatch is never
silently folded into a report; --show just makes the state auditable.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--show"
    path = bench.HWM_PATH
    if mode == "--reset":
        if os.path.exists(path):
            os.unlink(path)
            print(f"removed {path}")
        else:
            print(f"no hwm file at {path}")
        return
    if not os.path.exists(path):
        print(f"no hwm file at {path}")
        return
    with open(path) as f:
        d = json.load(f)
    fp = bench._code_fingerprint()
    afp = bench._analytical_fingerprint()
    ext_ok = d.get("fingerprint") == fp
    a = d.get("analytical") or {}
    ana_ok = a.get("fingerprint") == afp
    print(f"hwm file: {path}")
    print(f"extraction marks: fingerprint {d.get('fingerprint')} "
          f"({'MATCH' if ext_ok else 'MISMATCH vs ' + fp})")
    for k in ("dps8", "dps32", "eff_8_to_32", "dps2_small", "dps8_small",
              "eff_2_to_8"):
        if k in d:
            print(f"  {k}: {round(d[k], 3)}")
    for k in ("eff_8_to_32_pair", "eff_2_to_8_pair"):
        if k in d:
            print(f"  {k}: {d[k]}")
    print(f"analytical marks: fingerprint {a.get('fingerprint')} "
          f"({'MATCH' if ana_ok else 'MISMATCH vs ' + afp})")
    for name, sec in sorted((a.get("queries") or {}).items()):
        print(f"  {name}: {sec}s")


if __name__ == "__main__":
    main()
