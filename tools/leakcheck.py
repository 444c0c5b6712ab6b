#!/usr/bin/env python3
"""Proprietary-reference scan over the repo's tracked source.

Greps every tracked text file for categories of strings that must never
appear in a from-public-knowledge-only codebase: non-public package
imports, internal-looking URLs, cloud bucket URIs, chat-archive links,
credential-shaped tokens, and internal environment variables. Emits
LEAKCHECK.json with run metadata (UTC timestamp, scanned commit SHA,
file and pattern counts) so each round's "no hits" claim is
independently re-checkable rather than a hand-editable constant.

Usage: python3 tools/leakcheck.py [round_number]
(With no argument, the round is inferred as 1 + the newest committed
CORRECTNESS_r{N}.json — i.e. the round currently being built.)
"""
import glob, json, re, subprocess, sys, datetime


def _inferred_round():
    rounds = [int(m.group(1)) for f in glob.glob("CORRECTNESS_r*.json")
              for m in [re.search(r"CORRECTNESS_r(\d+)\.json$", f)] if m]
    return max(rounds) + 1 if rounds else 0


ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else _inferred_round()

# public domains that legitimately appear in citations/Scaladoc
PUBLIC_URL_ALLOW = re.compile(
    r"https?://(www\.)?("
    r"spark\.apache\.org|apache\.org|arxiv\.org|doi\.org|dl\.acm\.org|"
    r"github\.com|duckdb\.org|scala-lang\.org|openjdk\.org|ietf\.org|"
    r"en\.wikipedia\.org|aclanthology\.org|research\.google|"
    r"scalatest\.org|json\.org|yaml\.org|parquet\.apache\.org)")

PATTERNS = {
    # imports/packages that are not Spark, Scala, Java, or this repo
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache|org\.scalatest|org\.scalacheck|"
        r"scala\.|java\.|javax\.|graft\.)[a-z]+\.(corp|internal|private)\b",
        re.M),
    "internal-url": re.compile(r"https?://[\w.-]*\b(corp|internal|intranet)\b[\w./-]*"),
    "nonpublic-url": None,  # handled specially: any URL not in the allowlist
    "bucket-uri": re.compile(r"\b(s3|gs|s3a|abfss?)://[\w./-]+"),
    "chat-link": re.compile(r"\b\w+\.slack\.com/archives/\w+"),
    "api-key": re.compile(r"\b(xox[bap]-[\w-]{10,}|sk-[A-Za-z0-9]{20,}|AKIA[A-Z0-9]{16})\b"),
    "internal-env": re.compile(r"\bsys\.env[.(]\"?(?!SPARK_GRAFT_|COURSIER_)[A-Z]{3,}_(INTERNAL|CORP|SECRET)\w*\b"),
}

URL_RX = re.compile(r"https?://[\w.-]+[\w./#?=&-]*")

files = subprocess.run(["git", "ls-files"], capture_output=True, text=True,
                       cwd=".").stdout.split()
sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                     text=True, cwd=".").stdout.strip()

hits = {k: [] for k in PATTERNS}
n_files = 0
for f in files:
    if f.endswith((".parquet", ".png", ".jar")):
        continue
    try:
        text = open(f, encoding="utf-8", errors="strict").read()
    except (UnicodeDecodeError, IsADirectoryError, FileNotFoundError):
        continue
    n_files += 1
    for cat, rx in PATTERNS.items():
        if cat == "nonpublic-url":
            for m in URL_RX.finditer(text):
                if not PUBLIC_URL_ALLOW.match(m.group(0)):
                    hits[cat].append(f"{f}: {m.group(0)[:90]}")
        elif rx is not None:
            for m in rx.finditer(text):
                hits[cat].append(f"{f}: {m.group(0)[:90]}")

out = {
    "round": ROUND,
    "scanned_at_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "commit": sha,
    "n_files_scanned": n_files,
    "n_patterns": len(PATTERNS),
    "n_hits": sum(len(v) for v in hits.values()),
    "hits": hits,
}
json.dump(out, open("LEAKCHECK.json", "w"), indent=2)
print(f"scanned {n_files} files at {sha[:10]}: {out['n_hits']} hits")
