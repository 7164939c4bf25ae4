"""Benchmark: Stage-I Dual-VAE/GAN training throughput (images/sec/chip).

Prints ONE JSON line:
  {"metric": "stage1_train_imgs_per_sec_per_chip", "value": N,
   "unit": "imgs/sec", "vs_baseline": R}

The reference publishes no throughput numbers (BASELINE.md); ``vs_baseline``
is measured against BASELINE_IMGS_PER_SEC — the PyTorch-1.4 single-GPU
reference doing the same per-batch work (3 backward passes through the
retained graph + per-batch host syncs) on a CUDA-10.1-era V100-class card,
estimated at 1500 imgs/s for res64/batch-64 Stage I.  The driver's north star
is >10x that (BASELINE.json).

Measured config: the ``res64-bf16`` production preset (bf16 MXU operands,
fp32 params/BN) with the spliced segment-wise backward — quality-validated
against fp32 on the synthetic convergence run (BASELINE.md: PCC 0.65 vs
0.62 after 30 epochs) and gradient-equivalence-tested vs the reference's
backward schedule.  Override with FMRI_TPU_BENCH_PRESET.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_IMGS_PER_SEC = 1500.0  # estimated CUDA reference (see module docstring)
BATCH = 256
WARMUP = 3
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
    )

    cfg = get_config(os.environ.get("FMRI_TPU_BENCH_PRESET", "res64-bf16"))
    c = cfg.model
    step = make_vgan_stage1_step(cfg, "vae-gan", donate=True)

    groups = init_vaegan(jax.random.key(0), cfg)
    opt = RmsProp()
    g = {k: {"params": groups["params"][k], "batch_stats": groups["batch_stats"][k]}
         for k in groups["params"]}
    state = make_state(g, {k: opt for k in g})

    x = jax.random.uniform(
        jax.random.key(1), (BATCH, c.image_size, c.image_size, 3),
        minval=-1.0, maxval=1.0)
    margin, eq, lam = jnp.float32(0.35), jnp.float32(0.68), jnp.float32(1e-6)

    # Pre-build the per-step PRNG keys so no host work lands inside the
    # timed loop (a mid-loop jax.random.key() serializes dispatch).
    keys = [jax.random.key(i) for i in range(WARMUP + ITERS)]
    # host pull of every key, not block_until_ready — the latter returns
    # early on the tunneled platform (see the NOTE below)
    import numpy as _np
    for k in keys:
        _np.asarray(jax.random.key_data(k))

    for i in range(WARMUP):
        state, metrics = step.train_step(state, x, keys[i], margin, eq, lam)
    # NOTE: a host transfer, not block_until_ready — on the tunneled TPU
    # platform block_until_ready returns before device completion, which
    # inflated throughput ~15x; float() forces the full dependency chain.
    float(metrics["loss_encoder"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step.train_step(state, x, keys[WARMUP + i],
                                         margin, eq, lam)
    float(metrics["loss_encoder"])
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "stage1_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
