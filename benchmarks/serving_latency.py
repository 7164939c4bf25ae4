"""Serving latency/throughput benchmark (in-process, real chip).

Drives :class:`fmri_tpu.eval.serve.BatchingServer` with an open-loop Poisson
request stream at several offered QPS levels and reports achieved
throughput, p50/p95/p99 latency and batch occupancy — the latency-bounded
serving numbers that complement the closed-loop batch throughput row in
``BENCH_SUITE.json``.

The model is a fresh-initialized res64 cognitive graph (vgan stage 2/3
serving path: CognitiveEncoder MLP -> Decoder); weights don't affect
timing.  Timing is host-pull synced inside ``ServingModel._run`` (the
tunneled platform's ``block_until_ready`` returns early — CLAUDE.md).

    python benchmarks/serving_latency.py --preset res64-bf16 \
        --max-batch 256 --min-bucket 32 --wait-ms 2 \
        --qps 2000,8000,32000 --duration 8

Output: one JSON line per QPS level + a closed-loop ceiling line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_model(preset: str, max_batch: int, min_bucket: int,
                output: str = "uint8"):
    from fmri_tpu.checkpoints.store import save_checkpoint
    from fmri_tpu.configs import get_config
    from fmri_tpu.eval.serve import ServingModel
    from fmri_tpu.train import stages

    cfg = get_config(preset)
    with tempfile.TemporaryDirectory() as d:
        s1, _, _ = stages.vgan_stage1(cfg, steps_per_epoch=1, donate=False)
        save_checkpoint(d, 0, s1)
        s2, _, _ = stages.vgan_stage2(cfg, d, steps_per_epoch=1, donate=False)
    return ServingModel("vgan", 2, cfg, s2, max_batch=max_batch,
                        min_bucket=min_bucket, output=output)


def closed_loop(model, iters: int = 30) -> dict:
    """End-to-end ceiling: back-to-back full buckets through the full path,
    INCLUDING host->device input and device->host image transfer.  On the
    tunneled axon platform these transfers ride the tunnel and dominate; on
    a direct-attached TPU host they ride PCIe and are negligible."""
    import numpy as np

    b = model.max_batch
    x = np.random.default_rng(0).normal(
        size=(b, *model.sample_shape())).astype(np.float32)
    model.reconstruct(x)  # warm
    t0 = time.monotonic()
    for _ in range(iters):
        model.reconstruct(x)
    dt = time.monotonic() - t0
    return {"bench": "serving_closed_loop", "batch": b,
            "output": model.output, "includes_transfer": True,
            "imgs_per_s": round(iters * b / dt, 1),
            "ms_per_batch": round(dt / iters * 1e3, 3)}


def compute_only(model, iters: int = 50) -> dict:
    """Chip serving capability: device-resident input, dispatch ``iters``
    programs, sync once by pulling one scalar from the LAST output (the
    repo's host-pull rule; per-batch device latency measured separately
    with a per-call scalar pull)."""
    import jax.numpy as jnp
    import numpy as np

    b = model.max_batch
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(b, *model.sample_shape())).astype(np.float32))

    def sync(o):
        return np.asarray(o[0][0, 0, 0, 0])

    sync(model._pipeline(model.state, x, None))  # warm
    t0 = time.monotonic()
    out = None
    for _ in range(iters):
        out = model._pipeline(model.state, x, None)
    sync(out)
    thr_dt = time.monotonic() - t0
    # per-batch latency: serialized by a scalar pull each call
    lats = []
    for _ in range(10):
        t1 = time.monotonic()
        sync(model._pipeline(model.state, x, None))
        lats.append(time.monotonic() - t1)
    return {"bench": "serving_compute", "batch": b,
            "includes_transfer": False,
            "imgs_per_s": round(iters * b / thr_dt, 1),
            "ms_per_batch_sync": round(float(np.median(lats)) * 1e3, 3)}


def open_loop(model, qps: float, duration: float, wait_ms: float,
              seed: int = 0) -> dict:
    import numpy as np

    from fmri_tpu.eval.serve import BatchingServer

    rng = np.random.default_rng(seed)
    x = rng.normal(size=model.sample_shape()).astype(np.float32)
    srv = BatchingServer(model, max_wait_ms=wait_ms)
    futs = []
    try:
        # Pre-sample Poisson inter-arrival gaps; pace submissions by
        # absolute schedule so Python jitter doesn't shift the offered load.
        n = max(1, int(qps * duration))
        gaps = rng.exponential(1.0 / qps, size=n)
        sched = np.cumsum(gaps)
        t0 = time.monotonic()
        for i in range(n):
            now = time.monotonic() - t0
            delay = sched[i] - now
            if delay > 0:
                time.sleep(delay)
            futs.append(srv.submit(x))
        for f in futs:
            f.result(timeout=120)
        wall = time.monotonic() - t0
        st = srv.stats()
        lat = st.get("latency_ms", {})
        return {"bench": "serving_open_loop", "offered_qps": qps,
                "achieved_qps": round(len(futs) / wall, 1),
                "requests": len(futs), "batches": st["batches"],
                "occupancy": round(st["occupancy"], 3),
                "wait_ms": wait_ms,
                "p50_ms": round(lat.get("p50", 0), 2),
                "p95_ms": round(lat.get("p95", 0), 2),
                "p99_ms": round(lat.get("p99", 0), 2)}
    finally:
        srv.close()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="res64-bf16")
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--min-bucket", type=int, default=32)
    p.add_argument("--wait-ms", type=float, default=2.0)
    p.add_argument("--qps", default="2000,8000,32000")
    p.add_argument("--duration", type=float, default=8.0)
    p.add_argument("--platform", default=None,
                   help="e.g. cpu (default: whatever JAX picks)")
    args = p.parse_args(argv)

    if args.platform:
        os.environ["FMRI_TPU_PLATFORM"] = args.platform
        import jax

        try:
            jax.config.update("jax_platforms", args.platform)
        except RuntimeError:
            pass

    model = build_model(args.preset, args.max_batch, args.min_bucket)
    t0 = time.monotonic()
    model.warmup()
    print(json.dumps({"bench": "serving_warmup",
                      "buckets": model.buckets,
                      "seconds": round(time.monotonic() - t0, 1)}),
          flush=True)
    print(json.dumps(compute_only(model)), flush=True)
    print(json.dumps(closed_loop(model)), flush=True)
    for qps in [float(q) for q in args.qps.split(",") if q]:
        print(json.dumps(open_loop(model, qps, args.duration, args.wait_ms)),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
