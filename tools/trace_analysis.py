"""XProf device-trace analyzer: per-HLO-category and top-op tables from a
jax.profiler trace directory (the --profile_dir mechanism, or traces captured
by tools/capture_trace.py).

The reference's profiling story is wall-clock segment timing in the tqdm bar
(main.py:44-156); on TPU the equivalent ground truth is the device trace.
This parses the xplane.pb with xprof's own converter — the same data the
TensorBoard profile UI shows — so kernel work can be targeted at measured
bytes/FLOPs instead of guesses.

    python tools/trace_analysis.py /tmp/xprof_ntt [--top 25] [--steps 3]
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os


def load_hlo_stats(trace_dir: str):
    """Rows of the xprof 'hlo_stats' tool for the newest xplane.pb under
    trace_dir; each row is a dict keyed by column id."""
    from xprof.convert import raw_to_tool_data as rtd

    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    return [dict(zip(cols, [c["v"] for c in r["c"]])) for r in d["rows"]]


def summarize(rows, steps: int = 1, top: int = 25):
    """(per-category table, top self-time ops); times converted to ms/step.

    total_self_time is µs over all captured steps — divide by the step count
    the capture window covered."""
    by_cat = collections.defaultdict(lambda: [0.0, 0.0])
    total = 0.0
    for r in rows:
        t = float(r["total_self_time"]) / 1e3 / steps     # ms/step
        by_cat[r["category"]][0] += t
        flops = r.get("model_flop_rate") or 0.0
        by_cat[r["category"]][1] += float(flops or 0.0) * t / 1e3  # GF est
        total += t
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1][0])
    ops = sorted(rows, key=lambda r: -float(r["total_self_time"]))[:top]
    return cats, ops, total


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--steps", type=int, default=3,
                   help="train steps inside the capture window")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--json_out", default="")
    args = p.parse_args(argv)

    rows = load_hlo_stats(args.trace_dir)
    cats, ops, total = summarize(rows, steps=args.steps, top=args.top)

    print(f"== per-HLO-category (ms/step; device-busy total {total:.2f} ms)")
    for cat, (t, _gf) in cats:
        print(f"{cat:32s} {t:8.3f}")
    print(f"\n== top {args.top} ops by self time")
    for r in ops:
        t = float(r["total_self_time"]) / 1e3 / args.steps
        name = (r.get("tf_op_name") or r["hlo_op_name"])[:90]
        bw = r.get("measured_memory_bw") or 0
        fr = r.get("model_flop_rate") or 0
        print(f"{t:8.3f} ms  {r['category']:/<20.20s} {name}  "
              f"[{float(bw):.0f} GB/s, {float(fr):.0f} GF/s]")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"categories": {c: t for c, (t, _) in cats},
                       "total_ms": total}, f, indent=2)


if __name__ == "__main__":
    main()
