#!/usr/bin/env python3
"""Compare two bench records and classify the delta: code regression vs
box drift.

Round-16 finding: the driver provisions a fresh VM instance per session,
and the SAME HEAD measured a uniform +27% wall-to-wall on a new instance
(179-query median per-query ratio 1.27x, 159 worse / 9 better, untouched
one-shot queries inflated the most). A total that moved is therefore
meaningless until the per-query ratio DISTRIBUTION says whether the move
is uniform (box) or localized (code). This tool prints that fingerprint,
and when both records carry the `calib` block (graft.Bench's fixed CPU
probes, added round 16) it also divides box speed out of the totals.

Usage: compare_bench.py PRIOR.json CURRENT.json [--top N]

Accepts either format per file:
  - graft.Bench full line: {"metric":"total","queries":{"qNN_name":sec,...},
    "calib":{"jvm1_sec":..,"sparkNN_sec":..},...}
  - driver round wrapper: {"n":..,"tail":"...\n{compact line}"} — the
    compact line keys queries by bare number in integer centiseconds.
"""
import argparse
import json
import re
import statistics


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        rec = doc
    elif "tail" in doc:
        # driver wrapper: the LAST '{"metric"' line in the tail is the
        # compact record, sized to survive the stdout-tail capture whole
        line = doc["tail"][doc["tail"].rfind('{"metric"'):].split("\n")[0]
        rec = json.loads(line)
    else:
        raise SystemExit(f"{path}: neither a bench record nor a driver wrapper")
    cs = rec.get("qunit") == "cs"
    qs = {}
    for k, v in rec["queries"].items():
        if v is None or v < 0:
            continue  # failure sentinel: excluded from ratios
        m = re.match(r"q0*(\d+)", k)
        key = m.group(1) if m else k
        qs[key] = v / 100.0 if cs else v
    # per-query contention stamps (round 21): full records carry
    # "qext":{name:[steal,iowait,other] CPU-s}; compact records carry
    # "qx":{num: combined centi-CPU-s, top offenders only}. combined =
    # steal + other-process busy (iowait excluded — our own writes cause
    # it). has_ext distinguishes "stamped clean" from "legacy record".
    ext = {}
    has_ext = False
    if "qext" in rec:
        has_ext = True
        for k, v in rec["qext"].items():
            m = re.match(r"q0*(\d+)", k)
            key = m.group(1) if m else k
            ext[key] = v[0] + v[2]
    elif "qx" in rec:
        has_ext = True
        for k, v in rec["qx"].items():
            m = re.match(r"q?0*(\d+)", k)
            key = m.group(1) if m else k
            ext[key] = v / 100.0
    calib = rec.get("calib")
    if calib is None and "cal" in rec:
        # 'ct' absent (legacy compact records, pre-r18) must map to None,
        # not False — None falls through to the retroactive steal-recompute
        # below, so a known-contaminated legacy anchor (e.g. BENCH_r17) is
        # still refused (ADVICE r18, high)
        _ct = rec["cal"].get("ct")
        calib = {"jvm1_sec": rec["cal"].get("j"), "spark_sec": rec["cal"].get("s"),
                 "disk256_sec": rec["cal"].get("d"),
                 "steal_sec": rec["cal"].get("st"),
                 "contaminated": None if _ct is None else bool(_ct)}
    # verdict: the explicit stamp when the record carries one (graft.Bench,
    # round 18+); otherwise recomputed from steal_sec with the SAME
    # threshold (max(30 CPU-s, 10% of wall)) so the policy covers the
    # legacy record population retroactively
    contaminated = (calib or {}).get("contaminated")
    if contaminated is None:
        st = (calib or {}).get("steal_sec")
        tot = rec.get("value")
        contaminated = (st is not None and tot is not None and st >= 0
                        and st > max(30.0, 0.10 * float(tot)))
    return {"total": rec.get("value"), "queries": qs, "calib": calib,
            "sf": rec.get("sf"), "contaminated": bool(contaminated),
            "ext": ext, "has_ext": has_ext}


def calib_ratio(prior, cur):
    """cur/prior box-slowness factor from the calib probes (jvm1 primary:
    it has no scheduler/memory component, so it is the cleanest pure-CPU
    constant). None when either record predates the calib block."""
    cp, cc = prior.get("calib"), cur.get("calib")
    if not cp or not cc:
        return None
    for key in ("jvm1_sec",):
        a = cp.get(key)
        b = cc.get(key)
        if a and b:
            return b / a
    return None


# the write-heavy query set (r18 attribution: the movers that track the
# DISK probe, not the CPU probes — dedup shuffle-write, sorted write,
# Z-order, compaction, stat/crosstab sinks, snapshot rewrites, commit log)
WRITE_HEAVY = {"9", "89", "129", "130", "155", "156", "164", "170"}


def suspect_gate(ext_cpu_s, wall_s):
    """A query's recorded time is SUSPECT (contention, not code) when the
    external CPU burned inside its timed window rivals the query's own
    wall time: steal+other >= max(0.5 CPU-s, 0.5 x wall). Calibration: a
    clean stamped run reads <=0.1 CPU-s of 'other' per query (background
    daemons); the r20 phantom-regression class (q70 0.69->1.34 s) needs
    >~1 CPU-s of co-process work inside a ~1.3 s window to displace our
    threads that much. 0.5x wall scales the gate for longer queries."""
    return ext_cpu_s >= max(0.5, 0.5 * wall_s)


def min_merge(paths, out_path):
    """Per-query-min pseudo-anchor from >=2 records (the validated
    contamination-era evidence protocol: steal only ever inflates, so the
    per-query min across attempts is an upper BOUND on the clean time —
    1.006x against the first clean sf10 record, SCALE.md r19). The merged
    record is labeled (min_merge_of) and stamped not-contaminated: it is
    exactly the anchor the protocol licenses, while any single ct:1
    input stays refused."""
    if len(paths) < 2:
        raise SystemExit("--min-merge needs at least 2 input records")
    recs = [load(p) for p in paths]
    sfs = {str(r.get("sf")).split("sf")[-1] for r in recs if r.get("sf")}
    if len(sfs) > 1:
        raise SystemExit(f"--min-merge inputs span scale factors {sfs} — refusing")
    mins = {}
    names = {}
    for p, r in zip(paths, recs):
        for k, v in r["queries"].items():
            if v >= 0 and (k not in mins or v < mins[k]):
                mins[k] = v
                names[k] = p
    total = sum(mins.values())
    jvm1 = min((r["calib"].get("jvm1_sec") for r in recs
                if r.get("calib") and r["calib"].get("jvm1_sec")), default=None)
    # carry the contention stamp of whichever record supplied each kept
    # min (round 21) — a min that is STILL stamped means every attempt saw
    # contention there and even the merged bound is an overestimate
    rec_by_path = dict(zip(paths, recs))
    qx = {k: round(rec_by_path[p]["ext"][k] * 100)
          for k, p in names.items()
          if rec_by_path[p]["ext"].get(k, 0.0) >= 0.25}
    merged = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": {("q" + k if k.isdigit() else k): v for k, v in mins.items()},
        "sf": recs[0].get("sf"),
        "min_merge_of": list(paths),
        "calib": {"jvm1_sec": jvm1, "steal_sec": -1, "contaminated": False,
                  "min_merge": True},
    }
    if any(r["has_ext"] for r in recs):
        merged["qx"] = qx
    with open(out_path, "w") as f:
        json.dump(merged, f)
    print(f"min-merge of {len(paths)} records -> {out_path}: "
          f"total {total:.1f} s over {len(mins)} queries "
          f"(upper bound on the clean time; jvm1 {jvm1})")


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("prior")
    ap.add_argument("current")
    ap.add_argument("rest", nargs="*",
                    help="with --min-merge: further input records")
    ap.add_argument("--top", type=int, default=10,
                    help="movers to list per direction (default 10)")
    ap.add_argument("--allow-contaminated-prior", action="store_true",
                    help="compare against a steal-contaminated prior anyway "
                         "(exploratory only — never for a series claim)")
    ap.add_argument("--min-merge", metavar="OUT",
                    help="instead of comparing, merge ALL positional records "
                         "(>=2) into a per-query-min pseudo-anchor at OUT")
    ns = ap.parse_args()
    if ns.min_merge:
        min_merge([ns.prior, ns.current] + ns.rest, ns.min_merge)
        return
    if ns.rest:
        raise SystemExit("extra positional records are only valid with --min-merge")
    top = ns.top
    prior, cur = load(ns.prior), load(ns.current)
    # policy-in-code (r17 verdict item 3): a record that graft.Bench
    # stamped contaminated (in-record steal over max(30 CPU-s, 10% of
    # wall)) is not a series anchor — refuse it as the PRIOR unless
    # explicitly overridden; a contaminated CURRENT gets a loud warning
    # (measuring a new run against a clean anchor is exactly the point).
    if prior.get("contaminated") and not ns.allow_contaminated_prior:
        raise SystemExit(
            f"{ns.prior}: stamped contaminated (in-record steal) — not a valid "
            "series anchor. Pass --allow-contaminated-prior for an exploratory "
            "comparison; do not base a round claim on it.")
    if cur.get("contaminated"):
        print("WARNING: CURRENT record is stamped contaminated (in-record steal) "
              "— its raw total must not become a series anchor")
    if prior.get("sf") and cur.get("sf") and str(prior["sf"]).split("sf")[-1] != str(cur["sf"]).split("sf")[-1]:
        print(f"WARNING: scale factors differ ({prior['sf']} vs {cur['sf']}) — ratios are not comparable")
    common = sorted(set(prior["queries"]) & set(cur["queries"]), key=lambda k: int(k) if k.isdigit() else 0)
    ratios = {k: cur["queries"][k] / prior["queries"][k]
              for k in common if prior["queries"][k] > 0}
    if not ratios:
        raise SystemExit("no common queries between the two records")
    med = statistics.median(ratios.values())
    worse = sum(1 for r in ratios.values() if r > 1.05)
    better = sum(1 for r in ratios.values() if r < 0.95)
    box = calib_ratio(prior, cur)
    print(f"totals: prior={prior['total']:.2f} s  current={cur['total']:.2f} s  "
          f"({cur['total'] / prior['total']:.3f}x)")
    if box is not None:
        print(f"calib (jvm1): box speed ratio {box:.3f}x -> "
              f"box-normalized total {cur['total'] / box:.2f} s "
              f"({cur['total'] / box / prior['total']:.3f}x vs prior)")
    else:
        print("calib: absent from at least one record (pre-round-16) — totals not box-normalized")
    # disk probe (round 18): CPU probes are blind to disk drift, and the
    # write-heavy query cluster is exactly where a fresh VM's disk shows;
    # a disk ratio far from the jvm1 ratio fingerprints that class
    dp = (prior.get("calib") or {}).get("disk256_sec")
    dc = (cur.get("calib") or {}).get("disk256_sec")
    # probe-size guard (ADVICE r19): a low-usable-space run shrinks the
    # probe, and a 16 MB probe's seconds are not comparable to a 256 MB
    # probe's. Records before round 20 never stamped the size; absent
    # means "the default 256 unless it was silently resized" — compare,
    # but only when both sides claim the same size.
    mp = (prior.get("calib") or {}).get("diskcal_mb", 256)
    mc = (cur.get("calib") or {}).get("diskcal_mb", 256)
    if dp and dc and dp > 0 and dc > 0 and mp != mc:
        print(f"calib (disk): probe sizes differ ({mp} vs {mc} MB) — "
              "disk ratio NOT comparable, skipping it")
    elif dp and dc and dp > 0 and dc > 0:
        print(f"calib (disk{mc}): {dp:.3f} -> {dc:.3f} s ({dc / dp:.3f}x) — "
              "judge write-heavy movers against THIS ratio, not the CPU one")
    for label, rec in (("prior", prior), ("current", cur)):
        st = (rec.get("calib") or {}).get("steal_sec", (rec.get("calib") or {}).get("st"))
        if st is not None and st >= 0:
            print(f"steal ({label}): {st:.1f} CPU-s stolen during the run"
                  + (" — BURSTY CO-TENANT LIKELY, expect non-uniform spikes" if st > 60 else ""))
    print(f"per-query ratio: median {med:.3f}x over {len(ratios)} common queries; "
          f"{worse} worse >5%, {better} better >5%")
    # classification: if the MEDIAN moved >10% and most queries moved the
    # same direction, the shift is box-wide; individual movers are then
    # judged against the median, not against 1.0
    if med > 1.10 and worse > 3 * max(better, 1):
        print(f"verdict: UNIFORM INFLATION (box drift fingerprint) — judge "
              f"individual queries against the {med:.2f}x median, not 1.0x")
    elif med < 0.90 and better > 3 * max(worse, 1):
        print(f"verdict: UNIFORM SPEEDUP (faster box or global win) — judge "
              f"individual queries against the {med:.2f}x median")
    else:
        print("verdict: LOCALIZED — the movers below are candidate code changes")
    # write-heavy tier (r18 ask #4, closed r20): these queries track the
    # DISK probe, so judging them against the CPU median misattributes a
    # disk-drifted VM as a code regression. When a comparable disk ratio
    # exists, classify them against it.
    wh = {k: r for k, r in ratios.items() if k in WRITE_HEAVY}
    disk_ok = dp and dc and dp > 0 and dc > 0 and mp == mc
    if wh and disk_ok:
        dratio = dc / dp
        whmed = statistics.median(wh.values())
        flagged = [k for k, r in wh.items() if r > 1.10 * dratio]
        print(f"write-heavy tier ({len(wh)} queries): median {whmed:.3f}x vs "
              f"disk ratio {dratio:.3f}x — "
              + (f"movers beyond 1.10x of disk: {', '.join('q'+k for k in sorted(flagged, key=int))}"
                 if flagged else "all within 1.10x of the disk ratio (disk drift, not code)"))
    elif wh:
        print("write-heavy tier: no comparable disk probe in both records — "
              "judge q" + ", q".join(sorted(wh, key=int)) + " with care")
    # contention-stamped suspects (round 21): a stamped query's ratio is
    # contention, not code — the r20 judging cycle graded 8 phantom
    # regressions on a contiguous q70-q76 stretch that only three clean
    # re-runs could exonerate; with per-query stamps the record itself
    # says which times to distrust. A suspect in the CURRENT record
    # invalidates an apparent regression; one in the PRIOR invalidates an
    # apparent improvement.
    cur_sus = {k for k in common
               if suspect_gate(cur["ext"].get(k, 0.0), cur["queries"][k])} \
        if cur["has_ext"] else set()
    prior_sus = {k for k in common
                 if suspect_gate(prior["ext"].get(k, 0.0), prior["queries"][k])} \
        if prior["has_ext"] else set()
    for label, rec, sus in (("current", cur, cur_sus), ("prior", prior, prior_sus)):
        if not rec["has_ext"]:
            print(f"contention stamps: {label} record predates per-query stamps")
        elif sus:
            qs = ", ".join(f"q{k} ({rec['ext'][k]:.1f} CPU-s ext)"
                           for k in sorted(sus, key=int))
            print(f"contention stamps ({label}): SUSPECT — {qs}; treat these "
                  f"ratios as contention, not code")
        else:
            print(f"contention stamps ({label}): no query exceeds the suspect gate")

    def mark(k):
        tags = []
        if k in cur_sus:
            tags.append(f"SUSPECT cur ext {cur['ext'][k]:.1f} CPU-s")
        if k in prior_sus:
            tags.append(f"SUSPECT prior ext {prior['ext'][k]:.1f} CPU-s")
        return f"  [{'; '.join(tags)}]" if tags else ""

    devs = sorted(ratios.items(), key=lambda kv: kv[1] / med, reverse=True)
    print(f"\ntop {top} above-median movers (ratio, vs-median, prior->cur s):")
    for k, r in devs[:top]:
        print(f"  q{k}: {r:.2f}x  ({r / med:.2f}x vs median)  "
              f"{prior['queries'][k]:.2f} -> {cur['queries'][k]:.2f}" + mark(k))
    print(f"\ntop {top} below-median movers:")
    for k, r in devs[-top:][::-1]:
        print(f"  q{k}: {r:.2f}x  ({r / med:.2f}x vs median)  "
              f"{prior['queries'][k]:.2f} -> {cur['queries'][k]:.2f}" + mark(k))


if __name__ == "__main__":
    main()
