"""Bit-exact comparison of sweep_ppo --metrics-jsonl streams.

Round-4 determinism probe (VERDICT r3 item 3): same-seed long runs were
observed to diverge across different host log/checkpoint cadences (peak
train return 685 vs 741), which silently set the noise band every quality
A/B is judged against.  This tool compares two (or more) full-precision
metrics streams on their COMMON update rows and reports the first
divergence per field — json floats round-trip exactly, so equal streams
compare bit-for-bit.

Usage: python scripts/compare_metrics.py a.jsonl b.jsonl [c.jsonl ...]
Exit 0 = all common rows identical on ALL fields (device math AND hyper
inputs); 1 = any field diverges.  A hyper-only divergence (lr /
entropy_coef / ent_mult) still exits 1 — the runs were not same-input, so
device-math determinism cannot be judged from them — but is reported
separately so the cause is visible.  2 = usage error / no common rows.
"""

from __future__ import annotations

import json
import sys

# Fields produced by DEVICE math (divergence here = the device program or
# its inputs differed).  Host-side schedule fields (lr, entropy_coef,
# ent_mult, and the round-5 KL-clip controller's clip_mult/clip_eps) are
# compared too but reported separately: a difference there means the
# HYPER inputs differed, explaining (not mystifying) the rest.
HYPER_FIELDS = ("lr", "entropy_coef", "ent_mult", "clip_mult", "clip_eps")


def load(path: str) -> dict[tuple, dict]:
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            # key by (config, update): multi-config sweeps restart update
            # numbering per config, and rows must never collide
            rows[(r.get("config", ""), int(r["update"]))] = r
    return rows


def main() -> int:
    paths = sys.argv[1:]
    if len(paths) < 2:
        print(__doc__)
        return 2
    streams = [load(p) for p in paths]
    common = set(streams[0])
    for s in streams[1:]:
        common &= set(s)
    if not common:
        print("no common update rows")
        return 2
    ref = streams[0]
    ok = True
    for i, (p, s) in enumerate(zip(paths[1:], streams[1:]), start=1):
        hyper_div = math_div = None
        for u in sorted(common):
            a, b = ref[u], s[u]
            for k in sorted(set(a) | set(b)):
                if k in ("config", "update"):
                    continue
                va, vb = a.get(k), b.get(k)
                if va == vb:
                    continue
                if k in HYPER_FIELDS:
                    if hyper_div is None:
                        hyper_div = (u, k, va, vb)
                else:
                    if math_div is None:
                        math_div = (u, k, va, vb)
            if math_div:
                break
        n = len(common)
        if math_div is None and hyper_div is None:
            print(f"[{paths[0]} vs {p}] IDENTICAL on {n} common rows "
                  f"(bit-exact, all fields)")
        else:
            ok = False
            if hyper_div:
                u, k, va, vb = hyper_div
                print(f"[{paths[0]} vs {p}] HYPER INPUT diverges first at "
                      f"{u}: {k} = {va!r} vs {vb!r}")
            if math_div:
                u, k, va, vb = math_div
                print(f"[{paths[0]} vs {p}] DEVICE MATH diverges first at "
                      f"{u}: {k} = {va!r} vs {vb!r}")
            else:
                print(f"[{paths[0]} vs {p}] device-math fields identical on "
                      f"{n} common rows despite hyper divergence")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
