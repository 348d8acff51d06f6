#!/usr/bin/env python3
"""Build the cross-scale admission-soak comparison table (VERDICT r16 #7).

Reads two admit-soak JSON lines (e.g. the recorded x50/80-batch r16 line
and the x200/160-batch r17 line) and prints the scaling table: per-batch
admission wall by store-age decile, compaction pauses by tier, gauge
(manifest-listing) wall, store footprint, and the derived-grace fields.
Sublinear = the x200 store's per-batch and listing curves stay flat while
the corpus is 4x and the batch 2x the x50 run's.

Usage: soak_scale_table.py <soakA.json> <soakB.json>
       (each file may be a STRESS_r{N}.json with several lines; the last
        admit-soak line wins)
"""
import json, sys, statistics


def load(path):
    last = None
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and d.get("stress") == "admit-soak":
            last = d
    if last is None:
        sys.exit(f"no admit-soak line in {path}")
    return last


def deciles(xs, n=10):
    k = max(1, len(xs) // n)
    return [round(statistics.mean(xs[i:i + k]), 2)
            for i in range(0, len(xs) - len(xs) % k, k)][:n]


def describe(d):
    secs = d["admission_batch_secs"]
    comp = d["compactions"]
    out = {
        "copies": d["copies"],
        "batches": d["batches"],
        "docs_per_batch": d["docs_per_batch"],
        "admitted": d["admitted"],
        "evict_every": d["evict_every"],
        "adm_total_s": round(sum(secs), 1),
        "adm_per_batch_deciles_s": deciles(secs),
        "adm_per_doc_ms_first10": round(
            1000 * statistics.mean(secs[:10]) / d["docs_per_batch"], 2),
        "adm_per_doc_ms_last10": round(
            1000 * statistics.mean(secs[-10:]) / d["docs_per_batch"], 2),
        "n_compactions": len(comp),
        "n_full": sum(1 for c in comp if c.get("full")),
        "full_batches": [c["batch"] for c in comp if c.get("full")],
        "slice_pauses_s": [round(c["pause_sec"], 1) for c in comp
                           if not c.get("full")],
        "full_pauses_s": [round(c["pause_sec"], 1) for c in comp
                          if c.get("full")],
        "store_files_final": d["store_files"],
        "store_mb_final": round(d["store_bytes"] / 1e6, 1),
        "kb_per_doc": round(d["store_bytes"] / 1024 / d["admitted"], 2),
        "final_dead_share": d["final_dead_share"],
        "needs_compaction_final": d["needs_compaction"],
        "max_probe_wall_ms": d.get("max_probe_wall_ms"),
        "retire_grace_conf_ms": d.get("retire_grace_conf_ms"),
        "effective_grace_ms": d.get("effective_grace_ms"),
    }
    if d.get("gauge_listing_ms"):
        g = d["gauge_listing_ms"]
        out["gauge_listing_ms_deciles"] = deciles(g)
        out["gauge_listing_ms_max"] = max(g)
    return out


def main():
    a, b = describe(load(sys.argv[1])), describe(load(sys.argv[2]))
    keys = sorted(set(a) | set(b), key=lambda k: (k not in a, k))
    w = max(len(k) for k in keys)
    print(f"{'key':<{w}}  A={sys.argv[1]}  B={sys.argv[2]}")
    for k in keys:
        print(f"{k:<{w}}  {a.get(k)}  |  {b.get(k)}")
    # the scale verdict: per-doc admission cost and listing wall must not
    # grow with corpus scale (flat = the 100 TB design claim holds)
    if a["adm_per_doc_ms_last10"] and b["adm_per_doc_ms_last10"]:
        r = b["adm_per_doc_ms_last10"] / a["adm_per_doc_ms_last10"]
        print(f"\nper-doc admission wall, last-decile B/A ratio: {r:.2f}"
              f" (corpus ratio {b['copies'] / a['copies']:.0f}x,"
              f" batch ratio {b['docs_per_batch'] / a['docs_per_batch']:.1f}x)")


if __name__ == "__main__":
    main()
