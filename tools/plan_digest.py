#!/usr/bin/env python3
"""Normalize Bench plan dumps into diffable shape digests.

Usage:
    SPARK_GRAFT_EXPLAIN_DIR=/tmp/plans sbt "runMain graft.Bench"   # dump
    python3 tools/plan_digest.py /tmp/plans plans/                 # digest

Keeps only each plan's operator TREE (the first section of
`explain("formatted")`) with volatile tokens scrubbed — expression ids
(`#123`), plan ids, scratch paths, whole-stage-codegen ids — so two
rounds' digests diff cleanly: any surviving diff is a real plan-shape
change (a broadcast flipping to sort-merge, a new Exchange, a lost
WholeStageCodegen span), not id churn.
"""
import os
import re
import sys


def digest(text: str) -> str:
    # the formatted explain's tree section ends at the first blank line
    tree = text.split("\n\n", 1)[0]
    tree = re.sub(r"#\d+[L]?", "#", tree)           # expression ids
    tree = re.sub(r"plan_id=\d+", "plan_id=", tree)  # exchange plan ids
    tree = re.sub(r"codegen id : \d+", "codegen id :", tree)
    tree = re.sub(r"\[codegen id : \d+\]", "[codegen]", tree)
    tree = re.sub(r"/tmp/[^ ,\]\)]*", "<scratch>", tree)  # scratch paths
    tree = re.sub(r"file:/[^ ,\]\)]*", "<path>", tree)
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
