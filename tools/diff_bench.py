"""Per-query diff of two bench artifacts (the same comparison the
round verdicts run on bench_full.json, applied to any pair — closes the
round-8 gap of sf1 artifacts existing with no per-query regression
check).

Usage: python tools/diff_bench.py OLD.json NEW.json [--top N]

Prints total ratio, per-query median ratio, and the N worst regressions
and best improvements (absolute-seconds-weighted: a 1.3x on a 0.1s query
is noise; on a 40s query it is not). Exit code 1 when any query >= 2s in
either artifact regressed by more than 1.5x — a loud gate suitable for
round close-out.
"""
from __future__ import annotations

import json
import statistics
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    old_p, new_p = args[0], args[1]
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))

    ratios = {q: (nq[q] / oq[q] if oq[q] > 0 else float("inf"))
              for q in common}
    print(f"old: {old_p}  total={old.get('value')}s  n={len(oq)}")
    print(f"new: {new_p}  total={new.get('value')}s  n={len(nq)}")
    if only_old:
        print(f"dropped queries: {only_old}")
    if only_new:
        print(f"added queries:   {only_new}")
    tot_common_old = sum(oq[q] for q in common)
    tot_common_new = sum(nq[q] for q in common)
    print(f"common-query totals: {tot_common_old:.1f}s -> "
          f"{tot_common_new:.1f}s ({tot_common_new / tot_common_old:.3f}x)")
    print(f"per-query ratio median={statistics.median(ratios.values()):.3f} "
          f"mean={statistics.fmean(ratios.values()):.3f}")

    # weight by absolute delta so sub-second noise doesn't dominate
    by_delta = sorted(common, key=lambda q: nq[q] - oq[q])
    print(f"\nworst {top} regressions (by +seconds):")
    for q in reversed(by_delta[-top:]):
        print(f"  {q:34s} {oq[q]:8.2f} -> {nq[q]:8.2f}  "
              f"({ratios[q]:.2f}x, {nq[q] - oq[q]:+.2f}s)")
    print(f"\nbest {top} improvements (by -seconds):")
    for q in by_delta[:top]:
        print(f"  {q:34s} {oq[q]:8.2f} -> {nq[q]:8.2f}  "
              f"({ratios[q]:.2f}x, {nq[q] - oq[q]:+.2f}s)")

    # cold-build reads are measurement artifacts, not plan regressions:
    # a query whose NEW number only ever ran against a cold
    # content-addressed rebuild (bench_minof "cold_only", or a single
    # run marked "cold") is excluded from the gate and reported —
    # re-measure warm instead of flagging (round-10 ann_pq precedent)
    def cold_only(art, q):
        st = art.get("cache_state", {}).get(q)
        if st is None:
            return False
        states = st if isinstance(st, list) else [st]
        return all(s == "cold" for s in states)

    def steal_only(art, q):
        # co-tenant CPU steal >= 2% on every run that produced the
        # number (bench.py host_steal; bench_minof keeps per-run lists)
        st = art.get("host_steal", {}).get(q)
        if st is None:
            return False
        flags = st if isinstance(st, list) else [st]
        return all(f is not None for f in flags)

    cold_skip = sorted(q for q in common
                       if (cold_only(new, q) or steal_only(new, q))
                       and ratios[q] > 1.5)
    bad = [q for q in common
           if max(oq[q], nq[q]) >= 2.0 and ratios[q] > 1.5
           and q not in cold_skip]
    if cold_skip:
        print(f"\ncold-build / steal-polluted reads excluded from the "
              f"gate (re-measure clean): {cold_skip}")
    if bad:
        print(f"\nREGRESSION GATE: {len(bad)} queries >=2s regressed "
              f">1.5x: {bad}")
    # an exclusion is a deferred verdict, not a pass: a broken
    # IndexCache commit (every run cold forever) or a persistently
    # noisy host would otherwise make a real regression permanently
    # ungated. Exit 2 = "re-measure these clean before signing off";
    # --allow-excluded acknowledges a re-measure happened elsewhere.
    if bad:
        sys.exit(1)
    if cold_skip and "--allow-excluded" not in sys.argv:
        print("GATE NOT CLEAN: excluded readings above need a clean "
              "re-measure (or pass --allow-excluded with the re-measure "
              "artifact committed)")
        sys.exit(2)
    sys.exit(0)


if __name__ == "__main__":
    main()
