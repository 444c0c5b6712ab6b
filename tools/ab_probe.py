#!/usr/bin/env python3
"""Focused A/B bench probe — the documented adjudication path for
per-query drift (SCALING.md "A/B adjudication protocol").

Problem: this box's full-suite wall clock drifts up to ~1.7x across
IDENTICAL binaries within a session, so a per-query delta between two
round benches is not, by itself, evidence of a regression. The signal
that survives the spread is a SAME-JVM pair: run the suspect queries and
a fixed set of anchor queries (known-stable plans untouched for rounds)
in one JVM with a fixed iteration count, and read each suspect's ratio
to baseline NORMALIZED by the anchors' ratio to the same baseline. Box
drift moves suspects and anchors together and cancels; a real regression
moves only the suspect.

Usage:
  python3 tools/ab_probe.py --queries q_a,q_b [--baseline BENCH_SELF_r11.json]
      [--anchors q_x,q_y] [--sf /root/testdata/sf0.1] [--iters 5]

The baseline may be either a raw graft.Bench JSON line (BENCH_SELF_r*.json
or target/bench_full.json) or a driver BENCH_r*.json (the Bench line is
recovered from its `tail`). Emits a ready-to-paste markdown table on
stdout and machine JSON to target/ab_probe.json.

Verdict thresholds (on the anchor-normalized ratio): <= 0.77 improved,
<= 1.30 box-spread (no action), else regression-candidate (bisect the
code, not the box).
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

DEFAULT_ANCHORS = "q_agg_pricing,q_sql_revenue,q_docs_langid,q_join_left"


def load_baseline(path):
    """Return {query: seconds} from either bench-output format."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict) and "tail" not in d:
        return d["queries"]  # raw graft.Bench line
    # driver BENCH_r*.json: recover the embedded Bench line from `tail`
    tail = d.get("tail", "")
    i = tail.rfind('{"metric"')
    if i < 0:
        sys.exit(f"{path}: neither a Bench JSON line nor a driver bench "
                 "with a recoverable tail")
    line, _ = json.JSONDecoder().raw_decode(tail[i:])
    return line["queries"]


def run_probe(queries, sf, iters):
    """One JVM, fixed iteration count, suspects + anchors together."""
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_BENCH_ONLY=",".join(queries),
               SPARK_GRAFT_BENCH_ITERS=str(iters),
               SPARK_GRAFT_BENCH_VERBOSE="1")
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    for ln in reversed(proc.stdout.splitlines()):
        s = ln.strip()
        if s.startswith("[info] "):
            s = s[len("[info] "):]
        if s.startswith('{"metric"'):
            return json.loads(s)["queries"]
    sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:] + "\n")
    sys.exit("no Bench JSON line found in sbt output")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated suspect queries")
    ap.add_argument("--anchors", default=DEFAULT_ANCHORS)
    ap.add_argument("--baseline", default="BENCH_SELF_r11.json")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    suspects = [q for q in args.queries.split(",") if q]
    anchors = [q for q in args.anchors.split(",") if q]
    base = load_baseline(args.baseline)
    missing = [q for q in suspects + anchors if q not in base]
    if missing:
        sys.stderr.write(f"note: not in baseline (raw ratio unavailable): "
                         f"{missing}\n")

    now = run_probe(suspects + anchors, args.sf, args.iters)

    drifts = [now[a] / base[a] for a in anchors
              if a in now and a in base and base[a] > 0]
    anchor_drift = statistics.median(drifts) if drifts else None

    rows, out = [], {"anchor_drift": anchor_drift, "iters": args.iters,
                     "sf": args.sf, "baseline": args.baseline,
                     "anchors": {a: now.get(a) for a in anchors},
                     "suspects": {}}
    for q in suspects:
        t = now.get(q)
        b = base.get(q)
        raw = (t / b) if (t and b) else None
        norm = (raw / anchor_drift) if (raw and anchor_drift) else None
        verdict = ("no-baseline" if norm is None else
                   "improved" if norm <= 0.77 else
                   "box-spread" if norm <= 1.30 else
                   "regression-candidate")
        rows.append((q, b, t, raw, norm, verdict))
        out["suspects"][q] = {"base_s": b, "now_s": t, "raw_ratio": raw,
                              "norm_ratio": norm, "verdict": verdict}

    os.makedirs("target", exist_ok=True)
    with open("target/ab_probe.json", "w") as f:
        json.dump(out, f, indent=2)

    ad = f"{anchor_drift:.2f}" if anchor_drift else "n/a"
    print(f"## A/B probe — median-of-{args.iters}, one JVM, "
          f"anchors drift {ad}x vs {args.baseline}\n")
    print("| query | baseline s | probe s | raw ratio | anchor-normalized "
          "| verdict |")
    print("|---|---|---|---|---|---|")
    for q, b, t, raw, norm, verdict in rows:
        fmt = lambda v, p="%.2f": (p % v) if v is not None else "-"
        print(f"| `{q}` | {fmt(b)} | {fmt(t)} | {fmt(raw)} | {fmt(norm)} "
              f"| {verdict} |")
    print("\nAnchors (stable plans, same JVM): " +
          ", ".join(f"`{a}` {fmt(now.get(a))}s" for a in anchors
                    for fmt in [lambda v: ('%.2f' % v) if v else '-']))


if __name__ == "__main__":
    main()
