"""Op-level device profile of the north-star train step (VERDICT r4 #2).

Captures a jax.profiler device trace of the 8x8 D=8 chi=32 x32-chain SR
train step (the BENCH headline config), converts the xplane with xprof's
tool pipeline, and prints the top HLO ops by self time with their achieved
FLOP/s and memory-bandwidth utilization — xprof computes these from the
compiled layouts, i.e. PHYSICAL (padded) traffic, which is exactly the
accounting the logical-bytes MBU in bench.py cannot see.

Usage:  python scripts/profile_train.py [out_dir] [quick]
Writes: <out_dir>/op_profile.json, hlo_stats.json (raw tool data),
        <out_dir>/top_ops.md (the table for docs/tpu_engineering.md).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def capture(out_dir: str, quick: bool = False):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import bench

    ly = lx = 8
    D, chi, nchains = 8, 32, 32
    from peps_tpu.lattice import transpose_tps
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models import spin
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule

    model = spin.heisenberg(1.0)
    trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")
    rule = UpdateRule("exchange")
    tps = bench._su_tps(ly, lx, D, su_steps=10 if quick else 60)
    n = ly * lx
    configs = init_configs_occupancy(jax.random.PRNGKey(1), nchains, ly, lx,
                                     {0: n // 2, 1: n - n // 2})
    train_step = bench._make_train_step(model, chi, trunc, rule)
    step = jax.jit(train_step)

    # warm (compile) outside the trace
    tps2, configs, _ = step(tps, configs, jax.random.PRNGKey(2))
    _ = float(jnp.sum(tps2))

    trace_dir = os.path.join(out_dir, "trace")
    with jax.profiler.trace(trace_dir):
        out = tps
        key = jax.random.PRNGKey(3)
        for i in range(2 if quick else 3):
            key, ks = jax.random.split(key)
            out, configs, _ = step(out, configs, ks)
        _ = float(jnp.sum(out))
    return trace_dir


def convert(trace_dir: str, out_dir: str):
    import glob

    from xprof.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane.pb under {trace_dir}"
    results = {}
    for tool in ("op_profile", "hlo_stats", "framework_op_stats",
                 "overview_page"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
            if isinstance(data, bytes):
                data = data.decode("utf-8", errors="replace")
            path = os.path.join(out_dir, f"{tool}.json")
            with open(path, "w") as f:
                f.write(data)
            results[tool] = path
            print(f"wrote {path}")
        except Exception as e:       # tools vary by xprof version
            print(f"tool {tool}: {type(e).__name__}: {e}")
    return results


def top_ops_table(out_dir: str, k: int = 15):
    """Summarize hlo_stats (per-op time) into a markdown table."""
    path = os.path.join(out_dir, "hlo_stats.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    # gviz-style: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    try:
        cols = [c.get("label") or c.get("id") for c in data["cols"]]
        rows = [[c.get("v") if isinstance(c, dict) else c
                 for c in r["c"]] for r in data["rows"]]
    except (KeyError, TypeError):
        print("hlo_stats.json: unrecognized schema; inspect manually")
        return None
    lines = ["| " + " | ".join(str(c) for c in cols) + " |",
             "|" + "---|" * len(cols)]
    for r in rows[:k]:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    md = "\n".join(lines)
    with open(os.path.join(out_dir, "top_ops.md"), "w") as f:
        f.write(md + "\n")
    print(md[:4000])
    return md


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "docs/profile"
    quick = "quick" in sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    td = capture(out_dir, quick)
    convert(td, out_dir)
    top_ops_table(out_dir)
