#!/usr/bin/env python3
"""Local leak + copy gate (r13 directive #6) — a fast, self-contained
approximation of the driver's per-round LEAKCHECK/COPYCHECK sweeps, wired
into tools/verify_all.sh so a leak or a pasted reference block cannot sit
in the repo between driver sweeps.

Leak scan: every git-tracked text file is grepped for categories of
internal/proprietary residue (hosts, buckets, key material, internal
tooling shorthand). The engine is built from public knowledge only, so the
correct hit count is ZERO — any hit fails the gate and prints file:line.

Copy scan: the reference at /root/reference is Python/SQL; the repo is
Scala. Literal code copying would surface as long VERBATIM lines shared
with reference sources (SQL strings, comment blocks). Every
whitespace-normalized line >= MIN_LEN chars from reference source files is
indexed; tracked repo sources are scanned for membership. Golden parity
fixtures under src/test/resources are the documented exception (they ARE
reference outputs, committed as comparison targets).

Exit 0 = clean, 1 = findings (each printed with category and location).
"""
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
MIN_LEN = 40

# Categories mirror the driver's sweep: internal hosts/URLs, cloud
# buckets, credential material, internal tooling references, suspicious
# env vars. Patterns target PROPRIETARY residue; public Spark/Hadoop
# symbols never match.
LEAK_PATTERNS = [
    ("internal-host", re.compile(
        r"(?i)\b(?:[a-z0-9-]+\.)*(?:corp|internal|intranet)\.[a-z0-9.-]+\b")),
    ("internal-shortlink", re.compile(r"(?<![\w./-])go/[a-z][a-z0-9-]{2,}\b")),
    ("cloud-bucket", re.compile(r"\b(?:s3a?|gs|abfss?)://[a-zA-Z0-9._-]+")),
    ("aws-key", re.compile(r"\bAKIA[0-9A-Z]{16}\b")),
    ("api-key", re.compile(r"\bsk-[A-Za-z0-9_-]{20,}\b")),
    ("bearer-token", re.compile(r"(?i)\bbearer\s+[A-Za-z0-9._-]{20,}\b")),
    ("vendor-name", re.compile(r"(?i)\banthropic\b|\bclaude\b")),
    ("slack-channel", re.compile(r"(?<![\w&])#[a-z0-9-]*(?:claude|anthro)[a-z0-9-]*\b")),
]

TEXT_SUFFIXES = {".scala", ".sbt", ".py", ".sh", ".md", ".json", ".sql",
                 ".txt", ".yml", ".yaml", ".properties", ".conf", ".csv"}

# committed reference outputs used as golden parity targets — matching the
# reference verbatim is their PURPOSE — plus the SQLite fixture generator,
# whose job is reproducing the reference's PUBLIC DDL (schema.py /
# challenge_db_create.sql) so SQLiteWarehouse specs decode the same layout
# the reference writes (S1: the data model IS the parity contract)
COPY_ALLOWED_PREFIXES = ("src/test/resources/", "tools/make_sqlite_fixture.py")

# the repo's own harness config lives under .claude/ — a path mention of
# it (README pointing at the verify skill) is not a vendor-name leak.
# Scoped to the vendor-name category ONLY: a line may legitimately
# mention .claude/ and still contain a real bucket/key/host hit.
VENDOR_NAME_FALSE_POSITIVE = re.compile(r"\.claude/")


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=REPO, check=True,
                         capture_output=True, text=True).stdout
    return [REPO / p for p in out.splitlines() if p]


def norm(line: str) -> str:
    return re.sub(r"\s+", " ", line.strip())


def leak_scan(files):
    findings = []
    self_path = Path(__file__).resolve()
    for f in files:
        if f.suffix not in TEXT_SUFFIXES:
            continue
        if f.resolve() == self_path:
            continue  # the pattern table itself contains the trigger words
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for cat, pat in LEAK_PATTERNS:
                if cat == "vendor-name" and VENDOR_NAME_FALSE_POSITIVE.search(line):
                    continue
                if pat.search(line):
                    findings.append(
                        (cat, f"{f.relative_to(REPO)}:{i}", line.strip()[:120]))
    return findings


def reference_line_index():
    idx = {}
    if not REFERENCE.exists():
        return idx
    for f in REFERENCE.rglob("*"):
        if not f.is_file() or f.suffix not in TEXT_SUFFIXES:
            continue
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for line in text.splitlines():
            n = norm(line)
            if len(n) >= MIN_LEN:
                idx.setdefault(n, str(f))
    return idx


def copy_scan(files):
    idx = reference_line_index()
    if not idx:
        return []
    findings = []
    for f in files:
        rel = str(f.relative_to(REPO))
        if f.suffix not in TEXT_SUFFIXES:
            continue
        if any(rel.startswith(p) for p in COPY_ALLOWED_PREFIXES):
            continue
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            n = norm(line)
            if len(n) >= MIN_LEN and n in idx:
                findings.append(
                    ("verbatim-reference-line", f"{rel}:{i}",
                     f"matches {idx[n]}: {n[:100]}"))
    return findings


def main():
    files = tracked_files()
    findings = leak_scan(files) + copy_scan(files)
    for cat, loc, detail in findings:
        print(f"[leakcopy] {cat} {loc}  {detail}")
    if findings:
        print(f"[leakcopy] FAILED: {len(findings)} finding(s)")
        return 1
    print(f"[leakcopy] clean: {len(files)} tracked files, 0 findings")
    return 0


if __name__ == "__main__":
    sys.exit(main())
