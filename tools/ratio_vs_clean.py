#!/usr/bin/env python3
"""Per-query min-of-runs ratio of a new bench artifact vs the r12 clean
reference run (bench_history.jsonl line at 2026-08-16T01:00Z, 173.0 s /
192 q) — the exact bar the r13 verdict set for settling the bench
question: if the MEDIAN ratio over queries untouched since r12 reads
>= 1.25x on a clean-probed run, treat it as a real regression and bisect.

  tools/ratio_vs_clean.py [NEW.json] [history] [ref-timestamp-prefix]
"""
import json, statistics, sys

new_path = sys.argv[1] if len(sys.argv) > 1 else "bench_last.json"
hist = sys.argv[2] if len(sys.argv) > 2 else "bench_history.jsonl"
ref_at = sys.argv[3] if len(sys.argv) > 3 else "2026-08-16T01:00"

ref = None
for line in open(hist):
    if line.startswith('{"at":"' + ref_at):
        ref = json.loads(line)
        break
assert ref, f"no history line at {ref_at}"
new = json.load(open(new_path))

# queries whose implementation r13/r14 touched (gate redesigns or new
# scenario steps) — excluded from the untouched-median per the verdict
TOUCHED = {
    "mql_write_path_txn",          # r13 kill-matrix extension
    "pipe_bpe_encode",             # r14 gate redesign (times encode now)
    "stream_dedup_incremental",    # r13 new gate (absent from r12 ref)
    "stream_dedup_store_maint",    # r14 new gate
    "mql_filter_user",             # r14 new gate
    "mql_write_path_pins",         # r13 new gate
}

ref_min = ref.get("queries_min", ref["queries"])
new_min = new.get("queries_min", new["queries"])
ratios = []
for q, old in sorted(ref_min.items()):
    if q in TOUCHED or q not in new_min:
        continue
    if old <= 0 or new_min[q] <= 0:
        continue
    ratios.append((new_min[q] / old, q, old, new_min[q]))

ratios.sort(reverse=True)
med = statistics.median(r[0] for r in ratios)
print(f"untouched queries compared: {len(ratios)}")
print(f"median min-of-runs ratio vs r12-clean: {med:.3f}x  "
      f"(bar: >=1.25x => real regression, bisect)")
print(f"new: load_before={new.get('load_before')} "
      f"calib={new.get('calib_sec')}->{new.get('calib_after')} "
      f"calib_io={new.get('calib_io_sec')}->{new.get('calib_io_after')} "
      f"contaminated={new.get('contaminated')}")
print("worst 12:")
for r, q, old, nw in ratios[:12]:
    print(f"  {r:5.2f}x  {q:32s} {old:7.3f} -> {nw:7.3f}")
print("best 5:")
for r, q, old, nw in ratios[-5:]:
    print(f"  {r:5.2f}x  {q:32s} {old:7.3f} -> {nw:7.3f}")
