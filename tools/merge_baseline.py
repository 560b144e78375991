#!/usr/bin/env python3
"""Min-merge a fresh idle bench-baseline dump into the committed envelope.

Usage: tools/merge_baseline.py <committed.json> <fresh.json> <out.json>

Per-query wall/cpu take the MIN of the two files (best-observed envelope);
streaming rates take the MAX (rates invert); queries present in only one
file carry over unchanged (new queries enter the envelope at their first
idle sample). total_wall/total_cpu are recomputed from the merged maps so
the suite-normalized ratios stay consistent with the per-query entries.
sf/cpus must match — merging across scale factors or thread counts would
produce a nonsense envelope.
"""
import json, sys

def main():
    committed_path, fresh_path, out_path = sys.argv[1:4]
    with open(committed_path) as f:
        a = json.load(f)
    with open(fresh_path) as f:
        b = json.load(f)
    for k in ("sf", "cpus"):
        if k not in a or k not in b:
            sys.exit(f"refusing to merge: '{k}' missing from "
                     f"{committed_path if k not in a else fresh_path}")
        if a[k] != b[k]:
            sys.exit(f"refusing to merge: {k} differs ({a[k]} vs {b[k]})")
    out = {"sf": a["sf"], "cpus": a["cpus"]}
    for sect, pick in (("wall", min), ("cpu", min), ("streaming", max)):
        ma, mb = a.get(sect, {}), b.get(sect, {})
        merged = {}
        for k in sorted(set(ma) | set(mb)):
            va, vb = ma.get(k), mb.get(k)
            vals = [v for v in (va, vb) if v is not None and v > 0]
            if vals:
                merged[k] = pick(vals)
        out[sect] = merged
    out["total_wall"] = round(sum(out["wall"].values()), 3)
    out["total_cpu"] = round(sum(out["cpu"].values()), 3)
    with open(out_path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(f"merged {len(out['wall'])} wall / {len(out['cpu'])} cpu / "
          f"{len(out['streaming'])} streaming entries -> {out_path}")

if __name__ == "__main__":
    main()
