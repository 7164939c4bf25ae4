"""Benchmark suite: training throughput (images/sec/chip) for every headline
config in BASELINE.md, machine-captured each round.

Prints ONE JSON line (driver contract) for the flagship config:
  {"metric": "stage1_train_imgs_per_sec_per_chip", "value": N,
   "unit": "imgs/sec", "vs_baseline": R}

then measures the rest of the suite (res100 paper preset, WAE Stage I,
Stage-II cognitive) and writes all results to ``BENCH_SUITE.json`` next to
this file.  Set ``FMRI_TPU_BENCH_FAST=1`` to skip the non-flagship configs;
``FMRI_TPU_BENCH_PRESET`` overrides the flagship preset.

The reference publishes no throughput numbers (BASELINE.md); ``vs_baseline``
is measured against a FLOP-scaled per-preset estimate of the PyTorch-1.4
single-GPU reference doing the same per-batch work (3 backward passes
through the retained graph + per-batch host syncs) on a CUDA-10.1-era
V100-class card: 1500 imgs/s for res64 Stage I, and — same methodology,
scaled by the 26.2/17.5 GFLOP/sample step cost (design.md §8e) — ~1000
imgs/s at the res100 paper preset (``baseline_for``).  res100 rows are
therefore like-for-like, keyed ``vs_baseline_res100``.  The driver's north
star is >10x the res64 figure (BASELINE.json).

All timings sync by pulling a scalar to host (``float(x)``) —
``block_until_ready`` returns early on the tunneled axon platform.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_IMGS_PER_SEC = 1500.0  # estimated CUDA reference (see module docstring)
# Like-for-like res100 baseline, same estimation methodology: the stage-1
# step costs 17.5 GFLOP/sample at res64 vs 26.2 at res100 (XLA cost model,
# docs/design.md §8e), so the same V100-class card runs FLOP-proportionally
# slower at the paper preset: 1500 * 17.5 / 26.2 ~= 1000 imgs/s.
BASELINE_RES100_IMGS_PER_SEC = round(BASELINE_IMGS_PER_SEC * 17.5 / 26.2)


def baseline_for(preset: str) -> float:
    """FLOP-scaled CUDA-estimate denominator for a preset's vs_baseline."""
    return (BASELINE_RES100_IMGS_PER_SEC if preset.startswith("res100")
            else BASELINE_IMGS_PER_SEC)
BATCH = 256
WARMUP = 3
ITERS = 20
# sub-ms rows (inference/serving pipelines) average many more dispatches so
# the tunnel's RTT jitter doesn't dominate; module-level so tests can patch
SYNC_WARMUP = 5
SYNC_ITERS = 100


def _prebuilt_keys(n: int):
    """Per-step PRNG keys built and host-synced outside the timed loop (a
    mid-loop jax.random.key() serializes dispatch)."""
    import jax
    import numpy as np

    keys = [jax.random.key(i) for i in range(n)]
    for k in keys:
        np.asarray(jax.random.key_data(k))
    return keys


def _time_steps(run_step, sync_metric: str, batch: int,
                warmup: int = WARMUP, iters: int = ITERS) -> float:
    """run_step(i) -> metrics dict; returns imgs/sec (host-transfer synced)."""
    for i in range(warmup):
        metrics = run_step(i)
    float(metrics[sync_metric])
    t0 = time.perf_counter()
    for i in range(iters):
        metrics = run_step(warmup + i)
    float(metrics[sync_metric])
    return batch * iters / (time.perf_counter() - t0)


def _apply_variant(cfg):
    """FMRI_TPU_BENCH_VARIANT: comma/plus-joined model-config experiment
    toggles — 'alt' (conv_alt backward rewrites), 'pbn' (Pallas BatchNorm
    backward), 'fdb' (fused 2B decoder batch: decode x_tilde and x_p in ONE
    pass with vsplit=2 per-sub-batch BN statistics — gradient-equivalent to
    the sequential pair, see models/norm.py and tests/test_steps.py::
    TestFusedDecoderBatch).  Lets the step-level effect of each be measured
    with no code change."""
    import dataclasses

    var = os.environ.get("FMRI_TPU_BENCH_VARIANT", "")
    kw = {}
    if "alt" in var:
        kw["alt_backward"] = True
    if "pbn" in var:
        kw["pallas_bn"] = True
    if "fdb" in var:
        kw["fused_decoder_batch"] = True
    if kw:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **kw))
    return cfg


def _vgan_stage1(preset: str) -> float:
    import jax
    import jax.numpy as jnp

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
    )

    cfg = _apply_variant(get_config(preset))
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
    keys = _prebuilt_keys(WARMUP + ITERS)
    box = [state]

    def run(i):
        box[0], metrics = step.train_step(box[0], x, keys[i], margin, eq, lam)
        return metrics

    return _time_steps(run, "loss_encoder", BATCH)


def _wae_stage1(preset: str) -> float:
    import jax

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        Adam, init_latent_disc, init_vaegan, make_state, make_wae_stage1_step,
    )

    cfg = get_config(preset)
    c = cfg.model
    step = make_wae_stage1_step(cfg, donate=True)
    k1, k2 = jax.random.split(jax.random.key(0))
    groups = init_vaegan(k1, cfg)
    g = {k: {"params": groups["params"][k], "batch_stats": groups["batch_stats"][k]}
         for k in ("encoder", "decoder")}
    g["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="uniform")
    opt = Adam()
    state = make_state(g, {k: opt for k in g})
    x = jax.random.uniform(
        jax.random.key(1), (BATCH, c.image_size, c.image_size, 3),
        minval=-1.0, maxval=1.0)
    keys = _prebuilt_keys(WARMUP + ITERS)
    box = [state]

    def run(i):
        box[0], metrics = step.train_step(box[0], x, keys[i])
        return metrics

    return _time_steps(run, "loss_reconstruction", BATCH)


def _cognitive_groups(cfg):
    """Named groups for the cognitive (stage 2/3) graph: fresh cognitive
    encoder + the stage-1 triplet standing in for a loaded checkpoint
    (weights untrained — throughput only depends on shapes)."""
    import jax

    from fmri_tpu.train import init_cognitive, init_vaegan

    ks = jax.random.split(jax.random.key(0), 2)
    vg = init_vaegan(ks[0], cfg)
    cog = init_cognitive(ks[1], cfg)
    return {
        "encoder": cog,
        "decoder": {"params": vg["params"]["decoder"],
                    "batch_stats": vg["batch_stats"]["decoder"]},
        "discriminator": {"params": vg["params"]["discriminator"],
                          "batch_stats": vg["batch_stats"]["discriminator"]},
        "teacher_encoder": {"params": vg["params"]["encoder"],
                            "batch_stats": vg["batch_stats"]["encoder"]},
    }


def _pair_batch(cfg):
    import jax

    c = cfg.model
    return {
        "fmri": jax.random.normal(jax.random.key(1), (BATCH, c.num_voxels)),
        "image": jax.random.uniform(
            jax.random.key(2), (BATCH, c.image_size, c.image_size, 3),
            minval=-1.0, maxval=1.0),
    }


def _vgan_cognitive(preset: str, stage: int) -> float:
    """Stage-II (encoder+disc trained, distillation) or Stage-III
    (decoder+disc trained, encoder frozen) cognitive training throughput."""
    import jax.numpy as jnp

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import RmsProp, make_state, make_vgan_cognitive_step

    cfg = get_config(preset)
    step = make_vgan_cognitive_step(cfg, stage=stage, donate=True)
    trained = ("encoder", "discriminator") if stage == 2 else (
        "decoder", "discriminator")
    state = make_state(_cognitive_groups(cfg),
                       {k: RmsProp(clip=1.0) for k in trained})
    batch = _pair_batch(cfg)
    margin, eq, lam = jnp.float32(0.35), jnp.float32(0.68), jnp.float32(1e-6)
    keys = _prebuilt_keys(WARMUP + ITERS)
    box = [state]

    def run(i):
        box[0], metrics = step.train_step(box[0], batch, keys[i], margin, eq, lam)
        return metrics

    return _time_steps(run, "loss_encoder", BATCH)


def _vgan_stage2(preset: str) -> float:
    return _vgan_cognitive(preset, 2)


def _vgan_stage3(preset: str) -> float:
    return _vgan_cognitive(preset, 3)


def _wae_cognitive(preset: str, stage: int) -> float:
    """Cognitive WAE: stage 2 = latent alignment (encoder + latent D
    trained, ``train_wae_stage2.py``); stage 3 = decoder recon fine-tune
    (decoder + latent D trained, encoder frozen, ``train_wae_stage3.py``)."""
    import jax

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        Adam, init_latent_disc, make_state, make_wae_cognitive_step,
    )

    cfg = get_config(preset)
    step = make_wae_cognitive_step(cfg, stage, donate=True)
    groups = _cognitive_groups(cfg)
    del groups["discriminator"]  # no image discriminator in the WAE family
    groups["latent_disc"] = init_latent_disc(
        jax.random.key(3), cfg, init_scheme="normal")
    opt = Adam(b1=0.5, b2=0.999)
    trained = ("encoder", "latent_disc") if stage == 2 else (
        "decoder", "latent_disc")
    state = make_state(groups, {k: opt for k in trained})
    batch = _pair_batch(cfg)
    keys = _prebuilt_keys(WARMUP + ITERS)
    box = [state]

    def run(i):
        box[0], metrics = step.train_step(box[0], batch, keys[i])
        return metrics

    return _time_steps(run, "loss_reconstruction", BATCH)


def _wae_stage2(preset: str) -> float:
    return _wae_cognitive(preset, 2)


def _wae_stage3(preset: str) -> float:
    return _wae_cognitive(preset, 3)


def _wae_vgan_stage1(preset: str) -> float:
    """WAE/Dual-GAN Stage I: full VAE/GAN losses + the latent-D phase in one
    fused step (``wae_vgan_stage1.py``)."""
    import jax
    import jax.numpy as jnp

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        RmsProp, init_latent_disc, init_vaegan, make_state, make_wae_vgan_step,
    )

    cfg = get_config(preset)
    c = cfg.model
    step = make_wae_vgan_step(cfg, "vae-gan", donate=True)
    k1, k2 = jax.random.split(jax.random.key(0))
    vg = init_vaegan(k1, cfg)
    g = {k: {"params": vg["params"][k], "batch_stats": vg["batch_stats"][k]}
         for k in vg["params"]}
    g["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="uniform")
    opt = RmsProp()
    state = make_state(g, {k: opt for k in g})
    x = jax.random.uniform(
        jax.random.key(1), (BATCH, c.image_size, c.image_size, 3),
        minval=-1.0, maxval=1.0)
    margin, eq, lam = jnp.float32(0.35), jnp.float32(0.68), jnp.float32(1e-6)
    keys = _prebuilt_keys(WARMUP + ITERS)
    box = [state]

    def run(i):
        box[0], metrics = step.train_step(box[0], x, keys[i], margin, eq, lam)
        return metrics

    return _time_steps(run, "loss_reconstruction", BATCH)


def _inference_stage3(preset: str) -> float:
    """Serving path: the stage-3 fMRI->image eval step (CognitiveEncoder ->
    Decoder forward, no grads) — the op the reference's ``inference_gan.py``
    loops (``inference/inference_gan.py:269-307``)."""
    from fmri_tpu.configs import get_config
    from fmri_tpu.train import RmsProp, make_state, make_vgan_cognitive_step

    cfg = get_config(preset)
    step = make_vgan_cognitive_step(cfg, stage=3, donate=False)
    state = make_state(_cognitive_groups(cfg), {"decoder": RmsProp(clip=1.0)})
    batch = _pair_batch(cfg)
    _prebuilt_keys(1)

    def run(i):
        recon = step.eval_step(state, batch, None)
        return {"sync": recon[0, 0, 0, 0]}

    return _time_steps(run, "sync", BATCH, warmup=SYNC_WARMUP,
                       iters=SYNC_ITERS)


def _serving_pipeline(preset: str) -> float:
    """The production serving path (``fmri_tpu/eval/serve.py``): jitted
    preprocess->decode->denormalize->uint8 pipeline at the max bucket,
    device-resident params, scalar-pull sync — the compute row of
    ``benchmarks/serving_latency.py``."""
    import jax.numpy as jnp
    import numpy as np

    from fmri_tpu.configs import get_config
    from fmri_tpu.eval.serve import ServingModel
    from fmri_tpu.train import RmsProp, make_state

    cfg = get_config(preset)
    c = cfg.model
    state = make_state(_cognitive_groups(cfg), {"decoder": RmsProp(clip=1.0)})
    model = ServingModel("vgan", 3, cfg, state, max_batch=BATCH,
                         min_bucket=BATCH, output="uint8")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, c.num_voxels)).astype(np.float32))

    def run(i):
        out, _ = model._pipeline(model.state, x, None)
        return {"sync": out[0, 0, 0, 0]}

    return _time_steps(run, "sync", BATCH, warmup=SYNC_WARMUP,
                       iters=SYNC_ITERS)


# (name, measure fn, preset) — flagship FIRST: its JSON line is the driver
# contract and must land on stdout even if a later config fails.
SUITE = [
    ("stage1_vgan_res64_bf16", _vgan_stage1,
     os.environ.get("FMRI_TPU_BENCH_PRESET", "res64-bf16")),
    ("stage1_wae_res64", _wae_stage1, "res64"),
    ("stage1_wae_res64_bf16", _wae_stage1, "res64-bf16"),
    ("stage1_vgan_res100_bf16", _vgan_stage1, "res100-bf16"),
    ("stage1_wae_vgan_res64_bf16", _wae_vgan_stage1, "res64-bf16"),
    ("stage2_vgan_res64_bf16", _vgan_stage2, "res64-bf16"),
    ("stage2_vgan_fullbrain_bf16", _vgan_stage2, "fullbrain-bf16"),
    ("stage3_vgan_res64_bf16", _vgan_stage3, "res64-bf16"),
    ("stage2_wae_res64", _wae_stage2, "res64"),
    ("stage3_wae_res64", _wae_stage3, "res64"),
    # WAE steps are ~5x lighter in FLOPs than the vgan flavors, so their
    # per-layer fixed costs (BN reductions, lane-starved latent MLP) still
    # amortize past batch 256 (design.md §8e batch sweep: +9-16% at 1024,
    # while the flagship control is flat).  A `_b<N>` name suffix overrides
    # the batch for that row only (applied in main()).
    ("stage1_wae_res64_bf16_b1024", _wae_stage1, "res64-bf16"),
    ("stage2_wae_res64_b1024", _wae_stage2, "res64"),
    ("stage3_wae_res64_b1024", _wae_stage3, "res64"),
    ("inference_stage3_res64_bf16", _inference_stage3, "res64-bf16"),
    ("serving_pipeline_res64_bf16", _serving_pipeline, "res64-bf16"),
]


def _suite_batch(name: str, default: int) -> int:
    """Batch for a suite row: a trailing ``_b<N>`` overrides ``default``.

    ``default`` must be the pre-loop batch, NOT the current global — the
    global is mutated per row, and falling back to it leaked batch 1024
    into the rows after a ``_b1024`` one (caught by review; the round-3
    inference/serving rows were silently captured at 1024)."""
    import re

    m = re.search(r"_b(\d+)$", name)
    return int(m.group(1)) if m else default


def _warm_tpu(attempts: int = 3, timeout_s: int = 150) -> None:
    """Touch the device from a DISPOSABLE subprocess before the measured run.

    The first TPU contact after the tunnel has idled occasionally stalls
    >5 min (observed as bench exit 124 under the driver's timeout); a fresh
    retry succeeds.  A hung first contact inside THIS process cannot be
    recovered, so the touch runs in a child that can be killed and retried —
    once any process completes a device op, the tunnel is warm and the
    parent's own first contact is fast.  Failures are non-fatal (the bench
    proceeds and takes its chances).  Opt out: FMRI_TPU_BENCH_NO_WARM=1.
    """
    import subprocess

    if os.environ.get("FMRI_TPU_BENCH_NO_WARM") == "1":
        return
    if os.environ.get("FMRI_TPU_PLATFORM", "").lower() == "cpu":
        return
    touch = ("import jax, numpy as np; "
             "np.asarray(jax.numpy.zeros(()) + 1.0)")
    for i in range(attempts):
        try:
            subprocess.run([sys.executable, "-c", touch], timeout=timeout_s,
                           check=True, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return
        except subprocess.TimeoutExpired:
            print(f"bench: device warm-touch stalled (attempt {i + 1}/"
                  f"{attempts}); retrying", file=sys.stderr)
        except (subprocess.CalledProcessError, OSError):
            return  # touch can't run here (e.g. CPU-only test env): proceed


def main() -> None:
    global BATCH  # per-row `_b<N>` overrides below; restored after the loop
    from fmri_tpu.utils.compile_cache import enable as _compile_cache
    _compile_cache()  # persistent XLA cache: repeated bench runs skip compiles
    _warm_tpu()

    results = {}
    name, fn, preset = SUITE[0]
    # A preset/variant override measures a non-flagship config: record it
    # under the canonical key for that preset (hyphens normalized, so e.g.
    # FMRI_TPU_BENCH_PRESET=res100-bf16 updates the same
    # 'stage1_vgan_res100_bf16' row the suite loop writes) — the merge
    # below must never create a drifting near-duplicate key.
    if os.environ.get("FMRI_TPU_BENCH_PRESET"):
        name = f"stage1_vgan_{preset.replace('-', '_')}"
    variant = os.environ.get("FMRI_TPU_BENCH_VARIANT")
    if variant:
        name = f"{name}_variant_{variant.replace(',', '+')}"
    v = fn(preset)
    results[name] = {"imgs_per_sec": round(v, 1), "preset": preset,
                     "batch": BATCH,
                     "baseline_est_imgs_per_sec": baseline_for(preset),
                     "vs_baseline": round(v / baseline_for(preset), 2)}
    print(json.dumps({
        "metric": "stage1_train_imgs_per_sec_per_chip",
        "value": round(v, 1),
        "unit": "imgs/sec",
        "vs_baseline": round(v / baseline_for(preset), 2),
    }))
    sys.stdout.flush()

    # FAST skips the non-flagship configs; a variant run does too (the
    # variant toggles reach every _vgan_stage1 row and would otherwise be
    # recorded under the canonical keys).
    fast = os.environ.get("FMRI_TPU_BENCH_FAST") == "1" or bool(variant)
    if not fast:
        default_batch = BATCH
        for name, fn, preset in SUITE[1:]:
            BATCH = _suite_batch(name, default_batch)  # builders read this
            try:
                v = fn(preset)
                results[name] = {
                    "imgs_per_sec": round(v, 1), "preset": preset,
                    "batch": BATCH,
                    "baseline_est_imgs_per_sec": baseline_for(preset),
                    "vs_baseline": round(v / baseline_for(preset), 2)}
                if preset.startswith("res100"):
                    # like-for-like ratio, explicitly keyed (VERDICT r2 #7)
                    results[name]["vs_baseline_res100"] = (
                        results[name]["vs_baseline"])
                print(f"{name}: {v:.1f} imgs/s", file=sys.stderr)
            except Exception as e:  # keep the suite going; record the failure
                results[name] = {"error": f"{type(e).__name__}: {e}",
                                 "preset": preset}
                print(f"{name}: FAILED {e}", file=sys.stderr)
        BATCH = default_batch

    if not fast:
        # Host input-path row (CPU only): shuffled-epoch throughput over a
        # synthetic uint8 packed array through Batches (native C++ gather
        # where the measured dispatch policy picks it — fmri_tpu/native).
        try:
            import numpy as np

            from fmri_tpu import native
            from fmri_tpu.data.pipeline import Batches

            rng = np.random.default_rng(0)
            arr = rng.integers(0, 256, size=(16384, 64, 64, 3), dtype=np.uint8)

            def host_epoch(_):
                n = 0
                for b in Batches(arr, BATCH, shuffle=True, seed=1):
                    n += len(b)
                return n

            host_epoch(0)
            t0 = time.perf_counter()
            n = host_epoch(0)
            results["host_loader_epoch"] = {
                "imgs_per_sec": round(n / (time.perf_counter() - t0), 1),
                "batch": BATCH, "native": native.available()}
            print(f"host_loader_epoch: "
                  f"{results['host_loader_epoch']['imgs_per_sec']:.0f} imgs/s "
                  f"(native={native.available()})", file=sys.stderr)
        except Exception as e:
            results["host_loader_epoch"] = {"error": f"{type(e).__name__}: {e}"}

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_SUITE.json")
    # merge over the existing file: a FAST (flagship-only) run must not
    # clobber the other configs' machine-captured rows
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
