"""Summarize a sweep JSONL: failures, slowest rows, engine/oracle split.

    python scripts/sweep_summary.py scratch/sweep_sf1_r10.jsonl [top_n]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    rows = [json.loads(l) for l in open(path) if l.strip()]
    fails = [r for r in rows if not r["ok"]]
    print(f"{len(rows)} rows, {len(fails)} failures")
    for r in fails:
        print("FAIL", r["name"], r.get("issues"))
    rows.sort(key=lambda r: -r["sec"])
    print(f"\nslowest {top_n} (sec = engine + oracle + compare):")
    for r in rows[:top_n]:
        e, o = r.get("engine_sec"), r.get("oracle_sec")
        split = f" engine={e} oracle={o}" if e is not None else ""
        print(f"  {r['name']}: {r['sec']}{split}")
    es = [r for r in rows if r.get("engine_sec") is not None]
    if es:
        print(f"\ntotals: sec={round(sum(r['sec'] for r in rows), 1)}"
              f" engine={round(sum(r['engine_sec'] for r in es), 1)}"
              f" oracle={round(sum(r['oracle_sec'] for r in es), 1)}")


if __name__ == "__main__":
    main()
