"""Regenerate __spark_entry__._GATE_PRIORITY (stalest-first) from the
CORRECTNESS_r*.json reports on disk — never-driver-checked queries lead,
then queries ordered by the round of their latest green row (ties by
name). Rewrites the list and _GATE_PRIORITY_ASOF in place.

Run after adding gate rows each round:  python scratch/regen_gate_priority.py
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"


def main() -> int:
    latest: dict[str, int] = {}
    rounds = sorted(
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    for r in rounds:
        with open(os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")) as fh:
            for k, v in json.load(fh).items():
                if v.get("rows_match") and v.get("hash_match"):
                    latest[k] = r
    asof = rounds[-1]

    from openeo_odc_driver_spark.registry import QUERIES

    names = list(QUERIES)
    never = [n for n in names if n not in latest]
    green = sorted((n for n in names if n in latest),
                   key=lambda k: (latest[k], k))
    order = never + green
    body = "\n".join(f'    "{n}",' for n in order)
    path = os.path.join(REPO, "__spark_entry__.py")
    src = open(path).read()
    src = re.sub(r"_GATE_PRIORITY_ASOF = \d+",
                 f"_GATE_PRIORITY_ASOF = {asof}", src)
    src = re.sub(r"_GATE_PRIORITY = \[\n(?:    \"[^\"]+\",\n)+\]",
                 f"_GATE_PRIORITY = [\n{body}\n]", src)
    open(path, "w").write(src)
    print(f"asof=r{asof}: {len(never)} never-checked lead, "
          f"{len(green)} green (stalest r{latest[green[0]] if green else '-'}) "
          f"of {len(order)} total")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
