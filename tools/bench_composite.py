#!/usr/bin/env python3
"""Merge bench rep dumps into a per-query min-of-reps quiet composite.

Every committed rep this round carries the full per-query dump
(SPARK_GRAFT_BENCH_DUMP); per query the composite takes the MIN across
reps — the cleanest available estimate of the code's cost under
ambient neighbor noise, since a mid-run load spike inflates different
queries in different reps but never deflates one. Output: composite
total, per-family totals, per-query times, plus a drift report against
a reference rep (e.g. a prior round's quiet rep) for every query name
the reference carries.

Usage:
  tools/bench_composite.py [--ref REF.json] [--ref-tol 0.10] \
      [--out composite.json] rep1.json rep2.json ...

Rep files may be full dumps ({"queries": {name: {"sec": s, ...}}}) or
old stdout-line captures ({"queries": {name: sec}}); -1/missing times
are skipped. The reference may be either shape too (old reps only
carry their slowest ~40 queries — drift is reported over the
intersection).
"""
import argparse
import json
import sys


def per_query(rep):
    """name -> seconds, from either dump shape; skips failed (-1)."""
    out = {}
    for name, v in rep.get("queries", {}).items():
        sec = v.get("sec") if isinstance(v, dict) else v
        if sec is not None and sec >= 0:
            out[name] = float(sec)
    return out


def family(name):
    p = name.split("_")[0]
    return "q" if p[0] == "q" and p[1:].isdigit() else p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("reps", nargs="+")
    ap.add_argument("--ref", help="prior-round rep to diff untouched faces against")
    ap.add_argument("--ref-tol", type=float, default=0.10,
                    help="flag queries slower than ref by more than this fraction")
    ap.add_argument("--out", help="write the composite JSON here")
    args = ap.parse_args()

    reps = []
    for path in args.reps:
        with open(path) as f:
            reps.append((path, per_query(json.load(f))))
    names = sorted(set().union(*(set(q) for _, q in reps)))
    composite, source = {}, {}
    for n in names:
        times = [(q[n], path) for path, q in reps if n in q]
        if not times:
            continue
        composite[n], source[n] = min(times)
    fams = {}
    for n, s in composite.items():
        fams[family(n)] = fams.get(family(n), 0.0) + s
    total = sum(composite.values())

    result = {
        "metric": "composite_min_of_reps",
        "unit": "sec",
        "reps": args.reps,
        "n_queries": len(composite),
        "total": round(total, 3),
        "families": {k: round(v, 3) for k, v in sorted(fams.items())},
        "queries": {k: round(v, 3) for k, v in sorted(composite.items())},
    }

    print(f"composite over {len(reps)} reps: {len(composite)} queries, "
          f"total {total:.1f} s ({total / max(1, len(composite)):.3f} s/query)")
    for k, v in sorted(fams.items()):
        print(f"  family {k:>4}: {v:8.1f} s")
    # How much the min-merge bought vs the best single rep:
    for path, q in reps:
        t = sum(q.get(n, 0.0) for n in composite)
        cov = sum(1 for n in composite if n in q)
        print(f"  rep {path}: {t:8.1f} s over {cov} queries")

    if args.ref:
        with open(args.ref) as f:
            ref = per_query(json.load(f))
        both = sorted(set(ref) & set(composite))
        drift = []
        for n in both:
            if ref[n] > 0.01:  # sub-10ms times are pure jitter
                r = composite[n] / ref[n]
                if r > 1 + args.ref_tol:
                    drift.append((n, ref[n], composite[n], r))
        ref_total = sum(ref[n] for n in both)
        comp_total = sum(composite[n] for n in both)
        result["ref"] = {
            "path": args.ref,
            "n_overlap": len(both),
            "ref_total_overlap": round(ref_total, 3),
            "composite_total_overlap": round(comp_total, 3),
            "ratio": round(comp_total / ref_total, 3) if ref_total else None,
            "slower_than_tol": [
                {"query": n, "ref": round(a, 3), "composite": round(b, 3),
                 "ratio": round(r, 2)}
                for n, a, b, r in sorted(drift, key=lambda x: -x[3])
            ],
        }
        print(f"vs {args.ref}: {len(both)} shared queries, "
              f"{comp_total:.1f} s vs {ref_total:.1f} s "
              f"(x{comp_total / ref_total:.3f})" if ref_total else "ref empty")
        if drift:
            print(f"  {len(drift)} queries slower than ref by >{args.ref_tol:.0%}:")
            for n, a, b, r in sorted(drift, key=lambda x: -x[3])[:20]:
                print(f"    {n:<32} {a:7.3f} -> {b:7.3f}  x{r:.2f}")
        else:
            print(f"  no shared query slower than ref by >{args.ref_tol:.0%}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
