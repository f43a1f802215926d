#!/usr/bin/env python3
"""Self-tests for compare_bench.py's round-20 additions: the --min-merge
pseudo-anchor and the disk-probe-size guard / write-heavy classification.
Plain asserts, no framework: `python3 tools/test_compare_bench.py`."""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
CB = os.path.join(HERE, "compare_bench.py")


def rec(queries, jvm1=1.0, steal=100.0, disk=0.5, mb=256, sf="/x/sf0.1"):
    return {"metric": "total", "value": sum(queries.values()), "unit": "sec",
            "queries": queries, "sf": sf,
            "calib": {"jvm1_sec": jvm1, "spark8_sec": 0.2, "disk256_sec": disk,
                      "diskcal_mb": mb, "steal_sec": steal,
                      "contaminated": steal > max(30.0, 0.10 * sum(queries.values()))}}


def write(d, name, doc):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def run(*args):
    return subprocess.run([sys.executable, CB, *args],
                          capture_output=True, text=True)


def test_min_merge():
    with tempfile.TemporaryDirectory() as d:
        a = write(d, "a.json", rec({"q01_x": 2.0, "q02_y": 1.0}, steal=200))
        b = write(d, "b.json", rec({"q01_x": 1.5, "q02_y": 3.0}, steal=150, jvm1=0.9))
        out = os.path.join(d, "merged.json")
        r = run(a, b, "--min-merge", out)
        assert r.returncode == 0, r.stderr
        m = json.load(open(out))
        # per-query min, labeled, not contaminated, fastest jvm1 kept
        assert m["queries"] == {"q1": 1.5, "q2": 1.0}, m["queries"]
        assert abs(m["value"] - 2.5) < 1e-9
        assert m["min_merge_of"] == [a, b]
        assert m["calib"]["contaminated"] is False and m["calib"]["min_merge"] is True
        assert m["calib"]["jvm1_sec"] == 0.9
        # the merged anchor is ACCEPTED as a prior while each ct:1 input is refused
        cur = write(d, "cur.json", rec({"q01_x": 1.5, "q02_y": 1.0}, steal=0))
        assert run(a, cur).returncode != 0            # ct:1 prior refused
        assert run(out, cur).returncode == 0, run(out, cur).stderr
        # sf mismatch between inputs refused
        c = write(d, "c.json", rec({"q01_x": 1.0}, sf="/x/sf1"))
        assert run(a, c, "--min-merge", os.path.join(d, "no.json")).returncode != 0
        # fewer than 2 inputs refused (argparse needs both positionals anyway)
        assert run(a, "--min-merge", os.path.join(d, "no2.json")).returncode != 0


def test_disk_size_guard_and_write_heavy():
    with tempfile.TemporaryDirectory() as d:
        qs_p = {"q09_dedup_key": 1.0, "q89_sorted_write": 1.0, "q100_agg": 1.0}
        # current: write-heavy 1.5x, disk ratio 1.5x -> disk drift, not code
        qs_c = {"q09_dedup_key": 1.5, "q89_sorted_write": 1.5, "q100_agg": 1.0}
        p = write(d, "p.json", rec(qs_p, steal=0, disk=0.4))
        c = write(d, "c.json", rec(qs_c, steal=0, disk=0.6))
        r = run(p, c)
        assert r.returncode == 0, r.stderr
        assert "write-heavy tier" in r.stdout
        assert "disk drift, not code" in r.stdout, r.stdout
        # a genuinely regressed write-heavy query is flagged beyond the disk ratio
        qs_c2 = dict(qs_c, q09_dedup_key=3.0)
        c2 = write(d, "c2.json", rec(qs_c2, steal=0, disk=0.6))
        r2 = run(p, c2)
        assert "movers beyond 1.10x of disk: q9" in r2.stdout, r2.stdout
        # differing probe sizes: disk ratio refused, size named
        c3 = write(d, "c3.json", rec(qs_c, steal=0, disk=0.1, mb=16))
        r3 = run(p, c3)
        assert "probe sizes differ (256 vs 16 MB)" in r3.stdout, r3.stdout
        assert "no comparable disk probe" in r3.stdout


def test_contention_stamps():
    with tempfile.TemporaryDirectory() as d:
        qs_p = {"q70_cube": 0.69, "q71_pivot": 0.47, "q100_agg": 1.0}
        # r20 phantom-regression shape: q70/q71 inflate 2-4x in the current
        # record, with per-query stamps attributing the window to external
        # CPU (steal+other); q100 moves within noise, unstamped
        qs_c = {"q70_cube": 1.34, "q71_pivot": 1.81, "q100_agg": 1.02}
        p = write(d, "p.json", rec(qs_p, steal=0))
        cdoc = rec(qs_c, steal=1.5)
        cdoc["qext"] = {"q70_cube": [0.1, 0.0, 1.2], "q71_pivot": [0.0, 0.1, 2.3]}
        c = write(d, "c.json", cdoc)
        r = run(p, c)
        assert r.returncode == 0, r.stderr
        # stamped queries are named SUSPECT with their ext CPU-s
        assert "SUSPECT" in r.stdout, r.stdout
        assert "q70 (1.3 CPU-s ext)" in r.stdout, r.stdout
        assert "q71 (2.3 CPU-s ext)" in r.stdout, r.stdout
        # the unstamped mover is NOT marked
        assert "q100 (" not in r.stdout
        # prior predates stamps: said explicitly, not silently treated clean
        assert "prior record predates per-query stamps" in r.stdout, r.stdout
        # a stamped-clean record (qext present, nothing over gate) says so
        cdoc2 = rec(qs_c, steal=0)
        cdoc2["qext"] = {"q70_cube": [0.0, 0.0, 0.1]}  # under the 0.5 gate
        c2 = write(d, "c2.json", cdoc2)
        r2 = run(p, c2)
        assert "contention stamps (current): no query exceeds the suspect gate" \
            in r2.stdout, r2.stdout
        # compact records carry "qx" (combined centi-CPU-s, bare numbers)
        tail = {"metric": "total", "value": sum(qs_c.values()), "unit": "sec",
                "qunit": "cs",
                "queries": {"70": 134, "71": 181, "100": 102}, "sf": "0.1",
                "cal": {"j": 1.0, "s": 0.2, "d": 0.5, "st": 1.5, "ct": 0},
                "qx": {"70": 130, "71": 230}}
        w = write(d, "w.json", {"n": 21, "tail": json.dumps(tail)})
        r3 = run(p, w)
        assert "q70 (1.3 CPU-s ext)" in r3.stdout, r3.stdout
        # min-merge carries the kept observation's stamp forward
        out = os.path.join(d, "merged.json")
        r4 = run(c, w, "--min-merge", out)
        assert r4.returncode == 0, r4.stderr
        m = json.load(open(out))
        assert m["qx"].get("70") == 120 or m["qx"].get("70") == 130, m["qx"]


if __name__ == "__main__":
    test_min_merge()
    test_disk_size_guard_and_write_heavy()
    test_contention_stamps()
    print("compare_bench self-tests: OK")
