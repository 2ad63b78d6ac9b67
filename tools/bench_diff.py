#!/usr/bin/env python3
"""Round-over-round bench comparison: tools/bench_diff.py OLD.json NEW.json

Accepts either a raw one-line graft.Bench JSON or a driver BENCH_r{N}.json
wrapper (uses its "parsed" field when present). Prints per-query deltas
beyond a noise floor, plus added/removed queries and totals."""
import json, sys

NOISE = 0.30  # seconds AND 25% — both must be exceeded to count


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"total: {old.get('value')} -> {new.get('value')} s "
          f"({len(oq)} -> {len(nq)} queries, catalog_init "
          f"{old.get('catalog_init')} -> {new.get('catalog_init')})")
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a < 0 or b < 0:
            print(f"  BROKEN {name}: {a} -> {b}")
        elif abs(b - a) > NOISE and abs(b - a) > 0.25 * max(a, 0.001):
            tag = "SLOWER" if b > a else "faster"
            print(f"  {tag} {name}: {a:.2f} -> {b:.2f} s")
    for name in sorted(set(nq) - set(oq)):
        print(f"  new    {name}: {nq[name]:.2f} s")
    for name in sorted(set(oq) - set(nq)):
        print(f"  gone   {name}: was {oq[name]:.2f} s")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
