#!/usr/bin/env python3
"""Render (and optionally GATE) the scaling-slope table between two bench
runs of the same suite at different data scales (r17 verdict #3, r18
verdict #3).

Usage: python3 tools/scaling_slope.py <medians_small.json> <medians_big.json>
       [--top N] [--gate MULT]

Reads two graft.Bench medians files (the committed bench/*.json artifacts)
and prints a markdown table of per-query time ratios, rr-median series.
On the canonical 10x pair a ratio near 10 is linear scaling on a
CPU-bound query; well under 10 means fixed overheads still dominate;
well OVER ~13 (10x data + scheduling noise) is flagged SUPERLINEAR
unless the query is a documented Theta(n^2)-by-contract exemption.

--gate MULT turns the render into a loud regression gate for the
verify-recipe probe stage (SLOPE_MULT in tools/verify_all.sh): the big
run is MULT x the small run's rows, and the tool EXITS NONZERO when any
query breaks its slope contract:

  - non-exempt queries must stay under MULT x 1.5 (linear plus
    scheduling headroom);
  - the pinned contract-superlinear queries (EXEMPT below) get the
    quadratic budget MULT^2 x 1.5 — exempt does NOT mean unbounded, a
    "Theta(n^2) by contract" query that turns cubic fails here too;
  - a query missing from either run, or carrying the -1.0 failure
    sentinel, fails the gate (a query that ERRORS at scale must not
    read as "no slope data, fine").

Sub-second queries jitter: at small multipliers a 0.12 s query can read
2x on scheduler noise alone. A breach therefore requires BOTH the ratio
over budget AND an absolute excess (big - small x budget) above
GATE_MIN_EXCESS_S — a real quadratic blows through both within one
probe, pure jitter does not. The floor is deliberately absolute, not
relative: a linear query's excess grows with its runtime, a jittering
one's does not.
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

# a gate breach needs this many seconds of absolute excess on top of the
# ratio budget — filters sub-second scheduler jitter without ever hiding
# a real quadratic (which accumulates seconds within one probe)
GATE_MIN_EXCESS_S = 1.0


def main():
    a, b = sys.argv[1], sys.argv[2]
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 0
    gate = (float(sys.argv[sys.argv.index("--gate") + 1])
            if "--gate" in sys.argv else None)
    m01 = json.load(open(a))["medians_roundrobin"]
    m1 = json.load(open(b))["medians_roundrobin"]
    super_thresh = gate * 1.5 if gate is not None else 13
    rows = []
    breaches = []
    # Stale-exemption guard (r19 verdict #3): an EXEMPT entry naming a
    # query that no longer exists in the suite is a silent hole — a NEW
    # query could take the freed name (or the exemption rationale could
    # outlive the operator it described) and inherit a quadratic budget
    # nobody re-justified. Gate runs fail loudly until the dict is pruned.
    if gate is not None:
        for q in sorted(EXEMPT):
            if q not in m01 and q not in m1:
                breaches.append((q, "STALE EXEMPTION — named in EXEMPT but absent "
                                    "from both runs; prune it (or fix the suite)"))
    for q, t1 in m1.items():
        t0 = m01.get(q)
        if t0 is None or t0 <= 0 or t1 <= 0:
            rows.append((float("inf"), q, t0, t1, "MISSING/FAILED"))
            breaches.append((q, "missing from the small run or failed (-1.0 sentinel)"))
            continue
        r = t1 / t0
        note = ""
        if q in EXEMPT:
            note = f"expected-superlinear: {EXEMPT[q]}"
            if gate is not None:
                budget = gate * gate * 1.5
                if r > budget and t1 - t0 * budget > GATE_MIN_EXCESS_S:
                    note += f" — BUT over even the quadratic budget {budget:.1f}x"
                    breaches.append((q, f"{r:.1f}x exceeds the contract-quadratic "
                                        f"budget {budget:.1f}x (excess "
                                        f"{t1 - t0 * budget:.1f} s)"))
        elif r > super_thresh and (gate is None
                                   or t1 - t0 * super_thresh > GATE_MIN_EXCESS_S):
            note = "SUPERLINEAR — investigate"
            if gate is not None:
                breaches.append((q, f"{r:.1f}x exceeds the linear budget "
                                    f"{super_thresh:.1f}x (excess "
                                    f"{t1 - t0 * super_thresh:.1f} s)"))
        rows.append((r, q, t0, t1, note))
    # a query in the SMALL run but absent from the big one also fails the
    # gate — a probe that silently drops a query must not read as green
    if gate is not None:
        for q in m01:
            if q not in m1:
                breaches.append((q, "present in the small run but MISSING from the big run"))
    rows.sort(reverse=True)
    shown = rows[:top] if top else rows
    print("| query | small (s) | big (s) | ratio | note |")
    print("|---|---|---|---|---|")
    for r, q, t0, t1, note in shown:
        rs = "-" if r == float("inf") else f"{r:.1f}x"
        t0s = "-" if t0 is None else f"{t0:.3f}"
        t1s = "-" if t1 is None else f"{t1:.3f}"
        print(f"| {q} | {t0s} | {t1s} | {rs} | {note} |")
    tot0 = sum(v for v in m01.values() if v > 0)
    tot1 = sum(v for v in m1.values() if v > 0)
    if tot0 > 0 and tot1 > 0:
        print(f"\ntotals: small {tot0:.1f} s -> big {tot1:.1f} s "
              f"({tot1 / tot0:.1f}x)")
    flagged = [q for r, q, _, _, n in rows if "SUPERLINEAR" in n]
    print(f"superlinear (non-exempt): {len(flagged)}"
          + (f" -> {', '.join(flagged)}" if flagged else ""))
    if gate is not None:
        if breaches:
            print(f"\nSLOPE GATE (mult={gate:g}): FAIL — {len(breaches)} breach(es):")
            for q, why in breaches:
                print(f"  {q}: {why}")
            sys.exit(1)
        print(f"\nSLOPE GATE (mult={gate:g}): PASS — every non-exempt query under "
              f"{super_thresh:.1f}x, exemptions under {gate * gate * 1.5:.1f}x")


if __name__ == "__main__":
    main()
