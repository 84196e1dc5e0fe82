#!/usr/bin/env python3
"""Render the sf0.1 -> sf1.0 scaling-slope table (r17 verdict #3).

Usage: python3 tools/scaling_slope.py <medians_sf01.json> <medians_sf1.json>
       [--top N]

Reads two graft.Bench medians files (the committed bench/*.json artifacts)
and prints a markdown table of per-query time ratios at 10x the rows,
rr-median count() series. A ratio near 10 is linear scaling on a
CPU-bound query; well under 10 means fixed overheads still dominate at
sf1; well OVER ~13 (10x data + scheduling noise) is flagged SUPERLINEAR
unless the query is a documented Theta(n^2)-by-contract exemption.
"""
import json
import sys

# documented expected-superlinear queries (contract, not regression):
#   q21 embed_neardup — exact pairwise cosine is Theta(n^2) by definition
#     (the LSH/IVF families are the scale path; see Dedup.embeddingNearDups)
#   q22/q37 — BRUTE-FORCE ANN baselines (full scan per query) whose query
#     set scales with the corpus (vec_id % 50), so compute is n^2/50 by
#     construction; the scale path is q32 (SRP-LSH) / q35 (IVF), which
#     must stay ~linear here
#   q88 — OUTPUT-bound on this corpus, not plan decay: customer names are
#     dense sequential ids, and 10x ids gain a live digit, so the TRUE
#     lev<=1 match set grows 12.6x (262,500 -> 3,300,000 — analytic count
#     of single-digit-substitution pairs in 0..N); 14.5x time over 12.6x
#     output pairs = flat per-pair cost
EXEMPT = {
    "q21_embed_neardup": "exact pairwise cosine, Theta(n^2) by contract",
    "q22_ann_topk": "brute-force ANN baseline, queries x corpus = n^2/50 by contract",
    "q37_ann_int8": "int8 brute-force ANN baseline, same n^2/50 contract",
    "q88_fuzzy_join": "output-bound: true lev<=1 pairs grow 12.6x on dense "
                      "sequential ids (262.5k -> 3.3M analytic); per-pair cost flat",
}


def main():
    a, b = sys.argv[1], sys.argv[2]
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 0
    m01 = json.load(open(a))["medians_roundrobin"]
    m1 = json.load(open(b))["medians_roundrobin"]
    rows = []
    for q, t1 in m1.items():
        t0 = m01.get(q)
        if t0 is None or t0 <= 0 or t1 <= 0:
            rows.append((float("inf"), q, t0, t1, "MISSING/FAILED"))
            continue
        r = t1 / t0
        note = ""
        if q in EXEMPT:
            note = f"expected-superlinear: {EXEMPT[q]}"
        elif r > 13:
            note = "SUPERLINEAR — investigate"
        rows.append((r, q, t0, t1, note))
    rows.sort(reverse=True)
    shown = rows[:top] if top else rows
    print("| query | sf0.1 (s) | sf1.0 (s) | ratio (10x rows) | note |")
    print("|---|---|---|---|---|")
    for r, q, t0, t1, note in shown:
        rs = "-" if r == float("inf") else f"{r:.1f}x"
        t0s = "-" if t0 is None else f"{t0:.3f}"
        print(f"| {q} | {t0s} | {t1:.3f} | {rs} | {note} |")
    tot0 = sum(v for v in m01.values() if v > 0)
    tot1 = sum(v for v in m1.values() if v > 0)
    print(f"\ntotals: sf0.1 {tot0:.1f} s -> sf1.0 {tot1:.1f} s "
          f"({tot1 / tot0:.1f}x for 10x rows)")
    flagged = [q for r, q, _, _, n in rows if n.startswith("SUPERLINEAR")]
    print(f"superlinear (non-exempt): {len(flagged)}"
          + (f" -> {', '.join(flagged)}" if flagged else ""))


if __name__ == "__main__":
    main()
