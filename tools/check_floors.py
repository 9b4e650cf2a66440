#!/usr/bin/env python3
"""Mechanical clean-floor check for bench runs.

Usage:
    python3 tools/check_floors.py BENCH_r14.json        # driver bench capture
    python3 tools/check_floors.py bench_stdout.txt      # raw Bench stdout
    ... | python3 tools/check_floors.py -                # stdin

Parses per-query seconds from the bench output (works on the driver's
truncated "tail" captures too — every surviving "name":secs pair is used),
compares each against tools/clean_floors.json, and flags queries above
2x their clean floor with > 0.75 s absolute excess (the absolute guard
keeps sub-second noise from flagging).

The verdict separates regression from host noise mechanically:
  - flags + low steal + sane heap  -> REGRESSION (exit 1)
  - flags + high steal or oversized heap -> HOST-NOISE / HEAP (exit 0,
    the run is not evidence about the code)
  - no flags -> CLEAN (exit 0)
"""
import json
import re
import sys


def load_text(path: str) -> str:
    data = sys.stdin.read() if path == "-" else open(path).read()
    try:
        obj = json.loads(data)
        if isinstance(obj, dict) and "tail" in obj:
            return obj["tail"]
    except (json.JSONDecodeError, UnicodeDecodeError):
        pass
    return data


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    text = load_text(sys.argv[1])
    spec = json.load(open(f"{sys.path[0]}/clean_floors.json"))
    floors, default = spec["floors"], spec["default"]
    bands = spec.get("bands", {})

    # every "name":secs pair whose key has the registered-query SHAPE
    # (family letters + number [+ variant letter] + underscore, e.g.
    # a3b_, ep16_, k12b_, mm4_, i9x_ — plus the two flat names). This
    # excludes the attribution block's stage keys (steal, probe_mops,
    # cc_round_3, edges_sym, ...) and the gate line's scalars without
    # needing the full line to survive the driver's tail truncation.
    qname = re.compile(r"^(?:[a-z]{1,3}[0-9]+[a-z]?_[a-z0-9_]+|c_metrics|pricing_summary)$")
    times = {}
    for m in re.finditer(r'"([a-z][a-z0-9_]+)":(-?[0-9][0-9.eE+-]*)', text):
        k, v = m.group(1), float(m.group(2))
        if qname.match(k):
            times[k] = v  # last occurrence wins (the final line repeats)

    # Compact "qsec" line (round 20): the full per-query line is ~6 KB and
    # the driver keeps only a ~2.3 KB tail, so Bench also prints
    # {"metric":"qsec","n":N,"q":{a1:0.3,k12b:23.9,...}} near the END with
    # unquoted SHORT ids (the prefix before the first '_'; ambiguous ids
    # print in full). Expand ids back to full names via the floors file's
    # own name list — floors are regenerated from untruncated clean logs,
    # so every registered query is listed there by the time this runs.
    sid = lambda n: n if n in ("c_metrics", "pricing_summary") \
        else n.split("_", 1)[0]
    by_sid = {}
    for n in floors:
        by_sid.setdefault(sid(n), []).append(n)
    expand = {s: ns[0] for s, ns in by_sid.items() if len(ns) == 1}
    qlines = re.findall(r'"metric":"qsec".*?"q":\{([^}]*)\}', text)
    if not qlines:
        # the qsec line itself may lose its head (and with it the marker)
        # to the tail window — fall back to scanning for UNQUOTED id:secs
        # pairs, which appear nowhere else in the bench output (every
        # other JSON key is quoted; sbt's clock stamps start with digits)
        qlines = [" ".join(re.findall(
            r'(?<![\w":])(?:[a-z]{1,4}[0-9]+[a-z]?|c_metrics|'
            r'pricing_summary):-?[0-9][0-9.]*', text))]
    for qline in qlines:
        for m in re.finditer(r'([a-z][a-z0-9_]*):(-?[0-9][0-9.]*)', qline):
            k, v = m.group(1), float(m.group(2))
            times[expand.get(k, k)] = v

    gate = {}
    for key in ("heap_gb", "steal_sec", "probe_mops_start", "probe_mops_end"):
        m = re.findall(rf'"{key}":(-?[0-9][0-9.eE+-]*)', text)
        if m:
            gate[key] = float(m[-1])
    # memory-bandwidth bracket [start, end] GB/s (round-18 probe): the
    # k12b-style episodes throttle parallel streaming reads while the
    # single-thread spin stays clean — a collapsed reading marks the run
    # as bandwidth weather, not code. Also scan per-heavy membw_* entries
    # in the attribution block so a mid-run episode is caught even when
    # the run-level bracket looks healthy.
    m = re.findall(r'"membw_gbps":\[([0-9.]+),([0-9.]+)\]', text)
    if m:
        gate["membw_start"], gate["membw_end"] = map(float, m[-1])
    membw_readings = [float(v) for v in
                      re.findall(r'"membw(?:_gbps|_pre|_post|_start|_end)?"'
                                 r':([0-9][0-9.eE+-]*)', text)]
    membw_readings += [v for k, v in gate.items()
                       if k.startswith("membw") and "rand" not in k]
    # RANDOM-STRIDE bandwidth (round-19 probe validation): the sequential
    # probe stays in its healthy band under contention that collapses
    # random access (synthetic 24-thread load: seq 57-76% of idle, rand
    # 37-40%) — which is round 18's unattributed episode (verify_force
    # 4.8x slow, seq probe healthy). Shuffle build sides ARE random
    # access, so the rand probe is the episode instrument. Clean ≈ 25-27
    # GB/s on this host; < 10 GB/s (<40% of clean) is the signature.
    mr = re.findall(r'"membw_rand_gbps":\[([0-9.]+),([0-9.]+)\]', text)
    if mr:
        gate["membw_rand_start"], gate["membw_rand_end"] = map(float, mr[-1])
    rand_readings = [float(v) for v in
                     re.findall(r'"membw_rand(?:_gbps|_pre|_post)?"'
                                r':([0-9][0-9.eE+-]*)', text)]
    rand_readings += [v for k, v in gate.items()
                      if k.startswith("membw_rand")]

    flags = []
    for q, sec in sorted(times.items()):
        floor = floors.get(q, default)
        mult = bands.get(q, 2.0)
        if sec > mult * floor and sec - floor > 0.75:
            flags.append((q, sec, floor, mult))

    print(f"parsed {len(times)} query timings; gate: {gate or 'n/a'}")
    if not times:
        # Zero parsed timings means the capture lost its per-query map
        # (e.g. the driver tail truncated it) — that is NOT evidence of a
        # clean run, and saying CLEAN here defeats the tripwire entirely
        # (round-18 verdict, What's-wrong #2).
        print("verdict: NO-DATA — 0 query timings parsed; the capture is "
              "unusable as a floor check, not clean")
        return 3  # distinct from 2 (usage error) so wrappers can tell
    for q, sec, floor, mult in flags:
        print(f"  FLAG {q}: {sec:.2f}s vs clean floor {floor:.1f}s "
              f"({sec / floor:.1f}x, band {mult:.1f}x)")

    # clean-box membw measured ~30 GB/s (round-18 calibration, idle box,
    # -Xmx32g); a reading under 12 GB/s (<40% of clean) or a >2x
    # start->end collapse is the bandwidth-episode signature (rounds
    # 14/16: flat spin probe, low steal, slow shuffle stages)
    membw_low = bool(membw_readings) and min(membw_readings) < 12.0
    membw_collapse = ("membw_start" in gate and "membw_end" in gate and
                      gate["membw_end"] < gate["membw_start"] / 2)
    rand_low = bool(rand_readings) and min(rand_readings) < 10.0
    rand_collapse = ("membw_rand_start" in gate and
                     "membw_rand_end" in gate and
                     gate["membw_rand_end"] < gate["membw_rand_start"] / 2)
    noisy = (gate.get("steal_sec", 0) >= 20 or gate.get("heap_gb", 32) > 48
             or membw_low or membw_collapse or rand_low or rand_collapse)
    if not flags:
        print("verdict: CLEAN — every query within 2x of its clean floor")
        return 0
    if noisy:
        why = []
        if gate.get("steal_sec", 0) >= 20:
            why.append("steal")
        if gate.get("heap_gb", 32) > 48:
            why.append("heap")
        if membw_low or membw_collapse:
            why.append("membw")
        if rand_low or rand_collapse:
            why.append("membw-rand")
        print(f"verdict: HOST-NOISE/HEAP ({'+'.join(why)}) — flags exist "
              "but the gate readings say the environment, not the code, is "
              "the suspect; re-run on an idle box at -Xmx32g before "
              "concluding anything")
        return 0
    print("verdict: REGRESSION — flags on a clean run (low steal, sane heap)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
