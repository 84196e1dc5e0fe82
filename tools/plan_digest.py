#!/usr/bin/env python3
"""Normalize Bench plan dumps into diffable shape digests.

Usage:
    SPARK_GRAFT_EXPLAIN_DIR=/tmp/plans sbt "runMain graft.Bench"   # dump
    python3 tools/plan_digest.py /tmp/plans plans/                 # digest

Keeps each plan's operator TREE (the first section of
`explain("formatted")`) plus the SCAN-LEVEL facts from the detail
section — `PushedFilters`, `PartitionFilters`, `SelectedBucketsCount`,
`ReadSchema` — with volatile tokens scrubbed (expression ids `#123`,
plan ids, scratch paths, whole-stage-codegen ids) so two rounds'
digests diff cleanly: any surviving diff is a real plan change.

The scan facts are the r14 addition: the tree alone shows node SHAPE
but not whether a filter actually reached the parquet scan, whether a
bucketed join pruned buckets, or whether column pruning narrowed the
read — so a pushdown regression (e.g. a predicate rewritten into a
form the source can't accept) used to ship silently and surface only
as a slow bench number a round later. Now it fails the verify gate's
`diff -rq` the round it happens.
"""
import os
import re
import sys

# detail-section lines that carry scan-level execution facts; order in
# the file follows node numbering, so it is deterministic per plan
FACT_PREFIXES = (
    "PushedFilters:",
    "PartitionFilters:",
    "SelectedBucketsCount:",
    "ReadSchema:",
)


def scrub(text: str) -> str:
    text = re.sub(r"#\d+[L]?", "#", text)            # expression ids
    text = re.sub(r"plan_id=\d+", "plan_id=", text)  # exchange plan ids
    text = re.sub(r"codegen id : \d+", "codegen id :", text)
    text = re.sub(r"\[codegen id : \d+\]", "[codegen]", text)
    text = re.sub(r"/tmp/[^ ,\]\)]*", "<scratch>", text)  # scratch paths
    text = re.sub(r"file:/[^ ,\]\)]*", "<path>", text)
    return text


def digest(text: str) -> str:
    # the formatted explain's tree section ends at the first blank line
    tree = scrub(text.split("\n\n", 1)[0])
    facts = [scrub(ln.strip()) for ln in text.splitlines()
             if ln.strip().startswith(FACT_PREFIXES)]
    if facts:
        tree += "\n--- scan facts ---\n" + "\n".join(facts)
    return tree + "\n"


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(src)):
        if not f.endswith(".txt"):
            continue
        with open(os.path.join(src, f)) as fh:
            d = digest(fh.read())
        with open(os.path.join(dst, f), "w") as fh:
            fh.write(d)
        n += 1
    print(f"digested {n} plans into {dst}")


if __name__ == "__main__":
    main()
