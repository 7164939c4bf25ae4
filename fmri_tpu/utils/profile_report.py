"""Op-level summaries of ``jax.profiler`` traces, without TensorBoard.

The reference has no tracing at all (SURVEY.md §5.1); this framework's
``--profile`` flag dumps an xplane trace per run.  The standard viewer
(``tensorboard_plugin_profile``) is version-broken against the TF build in
this environment, so this module parses the ``*.xplane.pb`` protobuf directly
(via the proto shipped inside tensorflow) and prints the device-occupancy
breakdown that matters for TPU work: per-op-kind and per-op totals on the
sequential "XLA Ops" line, which sums to the real step time (async DMA lines
are in-flight spans, not occupancy, and are reported separately).

CLI:  python -m fmri_tpu.utils.profile_report <trace-dir-or-xplane.pb> [--top N]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


def find_xplane(path: str) -> str:
    """Resolve a trace dir (as passed to ``jax.profiler.trace``) or a direct
    ``.xplane.pb`` path to the newest xplane file."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True), key=os.path.getmtime)
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]


def _load_xspace(path: str):
    # The generated proto needs the pure-python protobuf backend when the
    # binary descriptor pool predates the installed protobuf (same workaround
    # the profile plugin itself would need).
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:  # pragma: no cover - depends on TF layout
        raise ImportError(
            "xplane_pb2 not found; this report needs the tensorflow wheel's "
            "bundled profiler protos") from e
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _op_kind(hlo_name: str) -> str:
    """Bucket an HLO instruction name into its op kind:
    '%convert_reduce_fusion.3 = ...' -> 'convert_reduce_fusion'.

    CAVEAT: fusion kinds are XLA's names for the fused computation's *root*
    ops, not its dominant work — e.g. a 'divide_subtract_fusion' in a train
    step can contain an entire weight-grad convolution with the optimizer
    update fused onto it (measured; docs/design.md §8f).  Before acting on
    a bucket, confirm against the compiled HLO
    (``jitted.lower(...).compile().as_text()``)."""
    name = hlo_name.split(" = ")[0].lstrip("%")
    return name.rstrip("0123456789.")


def summarize(path: str, steps: Optional[int] = None) -> Dict[str, dict]:
    """Aggregate one xplane file into, per device plane:
    ``{plane: {'steps': n, 'total_us': t, 'by_kind': {...}, 'by_op': {...},
    'async_us': {...}}}`` (all durations in us, totals over the whole trace).

    ``steps``: divide durations by this to get per-step numbers; when None it
    is inferred from the 'Steps' line (fallback 1).
    """
    xs = _load_xspace(path)
    out: Dict[str, dict] = {}
    for p in xs.planes:
        if "TPU" not in p.name and "GPU" not in p.name and "CPU" not in p.name:
            continue
        by_kind: Dict[str, float] = defaultdict(float)
        by_op: Dict[str, float] = defaultdict(float)
        async_us: Dict[str, float] = defaultdict(float)
        n_steps = steps
        total = 0.0
        for line in p.lines:
            if line.name == "XLA Modules" and n_steps is None:
                # the dominant jitted module executes once per step; the
                # 'Steps' line can carry several markers per step
                counts: Dict[int, int] = defaultdict(int)
                for ev in line.events:
                    counts[ev.metadata_id] += 1
                n_steps = max(counts.values(), default=1)
            if line.name == "XLA Ops":
                for ev in line.events:
                    md = p.event_metadata[ev.metadata_id]
                    us = ev.duration_ps / 1e6
                    by_kind[_op_kind(md.name)] += us
                    by_op[md.name] += us
                    total += us
            elif "Async" in line.name:
                for ev in line.events:
                    md = p.event_metadata[ev.metadata_id]
                    async_us[_op_kind(md.name)] += ev.duration_ps / 1e6
        if by_op:
            out[p.name] = {"steps": n_steps or 1, "total_us": total,
                           "by_kind": dict(by_kind), "by_op": dict(by_op),
                           "async_us": dict(async_us)}
    return out


def format_report(summary: Dict[str, dict], top: int = 15) -> str:
    lines: List[str] = []
    for plane, s in summary.items():
        n = s["steps"]
        lines.append(f"=== {plane}  ({n} steps, "
                     f"{s['total_us'] / n / 1e3:.2f} ms/step occupancy)")
        lines.append("-- by op kind (us/step, % of step):")
        for kind, us in sorted(s["by_kind"].items(), key=lambda kv: -kv[1])[:top]:
            lines.append(f"  {us / n:10.1f}  {100 * us / s['total_us']:5.1f}%"
                         f"  {kind}")
        lines.append(f"-- top ops (us/step):")
        for name, us in sorted(s["by_op"].items(), key=lambda kv: -kv[1])[:top]:
            lines.append(f"  {us / n:10.1f}  {name[:120]}")
        if s["async_us"]:
            tot_async = sum(s["async_us"].values())
            lines.append(f"-- async (in-flight DMA spans, not occupancy): "
                         f"{tot_async / n / 1e3:.2f} ms/step "
                         f"({', '.join(sorted(s['async_us']))})")
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace", help="trace dir (as given to --profile / "
                                  "jax.profiler.trace) or an .xplane.pb file")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--steps", type=int, default=None,
                    help="override the per-step divisor")
    args = ap.parse_args(argv)
    path = find_xplane(args.trace)
    summary = summarize(path, steps=args.steps)
    if not summary:
        print(f"no device 'XLA Ops' events in {path}")
        return 1
    print(f"trace: {path}")
    print(format_report(summary, top=args.top))
    return 0


if __name__ == "__main__":
    sys.exit(main())
