"""Multi-process (DCN-path) validation worker.

Launched N times by ``tests/test_mesh.py::test_multihost_two_processes`` (and
runnable by hand) to exercise the multi-host bring-up the reference never had
(SURVEY.md §2.8/§5.8): ``jax.distributed.initialize`` over a local
coordinator, a global mesh spanning the processes' devices, per-process batch
shards assembled into one global array
(``jax.make_array_from_process_local_data``), and XLA cross-process
collectives emitted from shardings.

Each process holds 2 virtual CPU devices, so 2 processes form a 4-device
``data`` mesh.  The check: a jitted global-mean over a batch whose halves are
produced by different processes must equal the mean of the full batch that
either process can compute locally (the all-reduce crossed the process
boundary).  With ``--full-step`` it additionally runs one TINY Stage-I
Dual-VAE/GAN train step on the global mesh and prints the encoder loss.

Usage:  python multihost_worker.py --port P --num-processes N --process-id I
Prints ``MULTIHOST_OK <global_mean>`` on success.
"""

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--full-step", action="store_true")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}")
    import jax

    # the site hook pins the platform at startup; config.update overrides it
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import numpy as np

    from fmri_tpu.parallel.mesh import make_mesh, replicated, shard_batch_multihost

    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, jax.devices()
    assert len(jax.local_devices()) == args.local_devices

    mesh = make_mesh(data=n_global)

    # Deterministic per-process halves of a global batch of 8 images: every
    # process can compute the expected global mean without communicating.
    h = w = 8
    per_proc = 4

    def proc_batch(pid: int) -> np.ndarray:
        rng = np.random.RandomState(1000 + pid)
        return rng.uniform(-1, 1, (per_proc, h, w, 3)).astype(np.float32)

    local = proc_batch(args.process_id)
    expected = np.mean(
        np.concatenate([proc_batch(i) for i in range(args.num_processes)], 0))

    global_batch = shard_batch_multihost(local, mesh)
    assert global_batch.shape == (per_proc * args.num_processes, h, w, 3), (
        global_batch.shape)

    @jax.jit
    def global_mean(x):
        # out replicated => XLA inserts the cross-process all-reduce
        return jax.lax.with_sharding_constraint(x.mean(), replicated(mesh))

    got = float(global_mean(global_batch))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    if args.full_step:
        from fmri_tpu.configs import TINY
        from fmri_tpu.parallel.mesh import shard_batch, shard_state
        from fmri_tpu.train import (
            RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
        )
        import jax.numpy as jnp

        step = make_vgan_stage1_step(TINY, "vae-gan")
        groups = init_vaegan(jax.random.key(0), TINY)
        g = {k: {"params": groups["params"][k],
                 "batch_stats": groups["batch_stats"][k]}
             for k in groups["params"]}
        state = shard_state(make_state(g, {k: RmsProp() for k in g}), mesh)
        c = TINY.model
        rng = np.random.RandomState(7)
        img = rng.uniform(
            -1, 1, (per_proc, c.image_size, c.image_size, 3)).astype(np.float32)
        x = shard_batch_multihost(img, mesh)
        with mesh:
            state, metrics = step.train_step(
                state, x, jax.random.key(0), jnp.float32(0.35),
                jnp.float32(0.68), jnp.float32(1e-6))
            loss = float(metrics["loss_encoder"])
        assert np.isfinite(loss), loss
        print(f"MULTIHOST_STEP_OK {loss:.6f}")

    print(f"MULTIHOST_OK {got:.8f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
