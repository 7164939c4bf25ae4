"""Online serving for fMRI->image reconstruction (production inference).

The reference's inference surface is an offline batch script
(``inference/inference_gan.py``); this module is the framework's
deployment-grade counterpart — a persistent server that turns a trained
cognitive checkpoint into a low-latency fMRI->image service.

TPU-native serving design:

  * **Static-shape bucketed batching.** XLA compiles one program per batch
    bucket (powers of two up to ``--max-batch``); a request batch is padded
    up to the nearest bucket, so steady-state serving never recompiles.
    Padding is exact: the eval path uses running BatchNorm statistics
    (``steps_vgan.py: eval_step``), so pad rows cannot perturb real rows.
  * **Dynamic microbatching.** One batcher thread coalesces concurrent
    requests until the largest bucket fills or ``--max-wait-ms`` elapses
    after the first queued request — the standard latency/throughput knob.
  * **Async dispatch, host-pull sync.** The batcher enqueues the XLA program
    and synchronizes completion by materializing the result on host (on the
    tunneled axon platform ``block_until_ready`` returns early; see
    CLAUDE.md), so reported latencies are honest.
  * **Transports.** In-process Python API (``BatchingServer.submit`` ->
    ``Future``) and a newline-delimited-JSON socket protocol (Unix domain or
    TCP); images return as base64 raw uint8 + shape.

Protocol (one JSON object per line, both directions)::

    {"id": 7, "fmri": [ ... num_voxels floats ... ]}
      -> {"id": 7, "shape": [H, W, 3], "dtype": "uint8", "data": "<base64>"}
    {"cmd": "stats"}  -> {"requests": n, "batches": n, "occupancy": f,
                          "latency_ms": {"p50": f, "p95": f, "p99": f}, ...}
    {"cmd": "ping"}   -> {"ok": true}
    {"cmd": "reload", "ckpt": "<dir>", "epoch": n?}   # hot weight swap
                      -> {"reloaded": "<dir>", "epoch": n}
                      # tree/shape-validated; refused (old state kept) on
                      # mismatch, and refused on non-loopback TCP binds
                      # unless --allow-remote-reload
    {"cmd": "generate", "n": k}   # sample k images from the prior
                      -> {"shape": [k, H, W, 3], "dtype": "uint8", ...}
                      # k capped at 8 x max-batch per request so one client
                      # cannot monopolize the model lock

Overload: the pending queue is bounded (``--max-queue``, default 8 x
max-batch).  Past saturation a request is SHED immediately ->
``{"id": ..., "error": "ServerOverloaded: ...", "shed": true}`` — bounded
worst-case latency for accepted requests, explicit backpressure for the
rest.  Shutdown drains accepted requests before stopping.

Stage-1 checkpoints (image->image autoencoding) are also servable: the
request key becomes ``"image"`` with a flat HWC float list in [0, 1].
A numpy client for this protocol (connection-pool fan-out so the
microbatcher sees concurrent requests) lives in ``fmri_tpu.eval.client``.

Scale-out: ``--data-parallel`` shards every bucket's batch axis over all
local devices; ``--mesh data=N,model=M`` additionally turns on voxel tensor
parallelism for cognitive checkpoints (the fc1 kernel shards
[voxels -> model], the same layout training stage 2/3 uses, so a sharded
training checkpoint serves with identical placement).
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import queue
import socketserver
import sys
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence


def _apply_platform_override() -> None:
    plat = os.environ.get("FMRI_TPU_PLATFORM")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass


def batch_buckets(max_batch: int, min_bucket: int = 1) -> List[int]:
    """Power-of-two bucket ladder ending exactly at ``max_batch``."""
    if max_batch < 1:
        raise ValueError("max_batch must be >= 1")
    out, b = [], max(1, min_bucket)
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return sorted(set(out))


class ServingModel:
    """A loaded checkpoint + jitted eval path with bucketed static shapes.

    ``reconstruct`` accepts any [N, ...] request batch: it is chunked to
    ``max_batch``, each chunk zero-padded up to the nearest bucket, and the
    results sliced back — the compiled-program set stays fixed at
    ``len(buckets)`` for the server's lifetime.
    """

    def __init__(self, family: str, stage: int, cfg, state, *,
                 max_batch: int = 64, min_bucket: int = 1,
                 sample: bool = False, seed: int = 0, mesh=None,
                 voxel_tp: bool = False, output: str = "float"):
        import jax
        import jax.numpy as jnp

        from fmri_tpu.data.transforms import denormalize, eval_preprocess
        from fmri_tpu.eval.inference import make_step_fns

        self.cfg = cfg
        self.family, self.stage = family, stage
        fns, self.data_kind = make_step_fns(family, stage, cfg)
        step = fns.eval_step
        self.max_batch = int(max_batch)
        self.mesh = mesh
        if voxel_tp and mesh is None:
            raise ValueError("voxel_tp requires a mesh")
        if mesh is None:
            self.buckets = batch_buckets(self.max_batch, min_bucket)
            # Pin params on device ONCE: a checkpoint-restored state is host
            # numpy, and leaving it that way re-transfers the whole parameter
            # tree on every call (measured 460 ms/call through the TPU
            # tunnel vs 4 ms device-resident).
            self.state = jax.device_put(state)
        else:
            # Data-parallel serving: every bucket is a multiple of the mesh's
            # data-axis size so the batch axis shards evenly; params
            # replicate (or, with ``voxel_tp``, the cognitive encoder's fc1
            # kernel shards [voxels -> model]); XLA SPMD-partitions the
            # compiled program.
            from fmri_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, shard_state

            dp = int(mesh.shape[DATA_AXIS])
            tp = int(mesh.shape[MODEL_AXIS])
            if voxel_tp:
                if self.data_kind != "pair":
                    raise ValueError(
                        "voxel_tp serves cognitive (fmri->image) checkpoints; "
                        f"family={family} stage={stage} takes images")
                if cfg.model.num_voxels % tp:
                    raise ValueError(
                        f"num_voxels={cfg.model.num_voxels} not divisible "
                        f"by the model axis ({tp})")
            if self.max_batch % dp:
                raise ValueError(
                    f"max_batch={max_batch} not divisible by the mesh's "
                    f"data axis ({dp})")
            self.buckets = [
                b * dp for b in batch_buckets(
                    self.max_batch // dp,
                    max(1, min_bucket // dp))]
            self.state = shard_state(state, mesh, voxel_tp=voxel_tp)
        self.voxel_tp = bool(voxel_tp)
        mean, std = cfg.data.mean, cfg.data.std

        if output not in ("float", "uint8"):
            raise ValueError(f"output must be 'float' or 'uint8', got {output!r}")
        self.output = output

        def pipeline(st, x, rng):
            if self.data_kind == "image":
                x = eval_preprocess(x, mean, std)
            if rng is None:
                out = step(st, x, None)
            else:
                # Split INSIDE the compiled program and return the carried
                # key: an eager per-call split would pay a tunnel round trip
                # (first call: a ~10s mini-compile) on every batch.
                rng, sub = jax.random.split(rng)
                out = step(st, x, sub)
            out = jnp.clip(denormalize(out, mean, std), 0.0, 1.0)
            if output == "uint8":
                # Quantize ON DEVICE: the device->host image transfer is 4x
                # smaller, and the socket transport ships uint8 anyway.
                out = (out * 255.0 + 0.5).astype(jnp.uint8)
            return out, rng

        # One compiled program per (bucket, rng-presence); preprocess,
        # decode, denormalize, clip and the rng split all fuse into it — no
        # eager ops on the serving path (the tunneled TPU platform pays ~10s
        # per eager op's first execution, CLAUDE.md).
        self._pipeline = jax.jit(pipeline)

        gen = fns.generate_step

        def gen_pipeline(st, rng, n):
            rng, sub = jax.random.split(rng)
            out = jnp.clip(denormalize(gen(st, sub, n), mean, std), 0.0, 1.0)
            if output == "uint8":
                out = (out * 255.0 + 0.5).astype(jnp.uint8)
            return out, rng

        # prior sampler (the reference's decode-noise branch,
        # ``vae_gan.py:294-297``) behind the same bucket discipline
        self._gen = jax.jit(gen_pipeline, static_argnums=(2,))
        self._mean, self._std = mean, std
        self._rng = jax.random.key(seed) if sample else None
        self._gen_rng = jax.random.key(seed + 0x5EED)
        self._lock = threading.Lock()   # jitted call + rng threading

    # -- shapes ------------------------------------------------------------

    def sample_shape(self) -> tuple:
        """Per-request input shape (no batch dim)."""
        if self.data_kind == "pair":
            return (self.cfg.model.num_voxels,)
        s = self.cfg.model.image_size
        return (s, s, 3)

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch

    # -- compute -----------------------------------------------------------

    def _run(self, x):
        """One fixed-shape padded batch -> host float images in [0, 1]."""
        import jax
        import numpy as np

        if self.mesh is None:
            inp = jax.numpy.asarray(x)
        else:
            from fmri_tpu.parallel.mesh import batch_sharding

            x = np.asarray(x)
            # batch axis over data; with voxel_tp the fmri voxel axis
            # additionally shards over model (fc1 partial matmul + psum)
            inp = jax.device_put(
                x, batch_sharding(self.mesh, x.ndim,
                                  shard_features=self.voxel_tp))
        # The carried rng stays device-resident across calls (None when not
        # sampling — the compiled program then returns (out, None)).
        out, self._rng = self._pipeline(self.state, inp, self._rng)
        # np.asarray is the completion sync (host pull).
        return np.asarray(out)

    def warmup(self, generate: bool = True) -> None:
        """Compile every bucket before traffic arrives — the reconstruct
        pipeline (including the rng-threaded variant when ``sample=True``)
        and, by default, the prior-sampling ``generate`` programs, so the
        first ``generate`` request cannot stall live reconstruct traffic
        behind a per-bucket XLA compile."""
        import numpy as np

        shape = self.sample_shape()
        saved_rng = self._rng
        for b in self.buckets:
            self._run(np.zeros((b, *shape), np.float32))
        # Restore the carried key: warmup must not advance the sampling
        # stream (when sample=True), or reconstruct outputs would depend on
        # warmup/bucket count instead of the seed alone — mirroring the
        # generate warmup's key-discard below.
        self._rng = saved_rng
        if generate:
            with self._lock:
                for b in self.buckets:
                    # Discard the returned key: warmup must not advance the
                    # sampling stream, or generate() outputs would depend on
                    # warmup/bucket count instead of the seed alone.
                    imgs, _ = self._gen(self.state, self._gen_rng, b)
                np.asarray(imgs)  # completion sync

    def reconstruct(self, x) -> "np.ndarray":
        """[N, ...] request batch (or a single sample) -> [N, H, W, 3]."""
        import numpy as np

        x = np.asarray(x, np.float32)
        single = x.ndim == len(self.sample_shape())
        if single:
            x = x[None]
        if len(x) == 0:
            s = self.cfg.model.image_size
            return np.zeros((0, s, s, 3),
                            np.uint8 if self.output == "uint8" else np.float32)
        outs = []
        with self._lock:
            for lo in range(0, len(x), self.max_batch):
                chunk = x[lo:lo + self.max_batch]
                n = len(chunk)
                b = self._bucket_for(n)
                if b > n:
                    pad = np.zeros((b - n, *chunk.shape[1:]), chunk.dtype)
                    chunk = np.concatenate([chunk, pad])
                outs.append(self._run(chunk)[:n])
        out = np.concatenate(outs)
        return out[0] if single else out

    def generate(self, n: int) -> "np.ndarray":
        """Sample ``n`` images from the prior (decode z ~ N(0, I) with BN
        running averages — the reference's ``model(None)`` eval branch).
        Buckets like :meth:`reconstruct` so steady state never recompiles;
        the rng split happens inside the compiled program (no eager ops)."""
        import numpy as np

        if n < 1:
            raise ValueError("n must be >= 1")
        outs, remaining = [], n
        with self._lock:
            while remaining > 0:
                k = min(remaining, self.max_batch)
                b = self._bucket_for(k)
                imgs, self._gen_rng = self._gen(self.state, self._gen_rng, b)
                outs.append(np.asarray(imgs)[:k])
                remaining -= k
        return np.concatenate(outs)

    def reload(self, ckpt_dir: str, epoch: Optional[int] = None) -> Dict:
        """Hot-swap weights from a checkpoint without restarting the server
        (zero-downtime model update).  The swap happens under the compute
        lock, between batches; compiled programs are reused — only the
        parameter buffers change.  A checkpoint whose tree structure or leaf
        shapes differ from the serving state is rejected up front (the old
        state stays installed), since the compiled programs would fail every
        subsequent request."""
        import jax

        from fmri_tpu.checkpoints.store import load_eval_state

        state, meta = load_eval_state(ckpt_dir, epoch=epoch)
        old_td = jax.tree_util.tree_structure(self.state)
        new_td = jax.tree_util.tree_structure(state)
        if old_td != new_td:
            raise ValueError(
                f"checkpoint {ckpt_dir!r} has a different state tree than "
                f"the serving model (family/stage mismatch?); reload refused")
        bad = [jax.tree_util.keystr(k)
               for (k, a), b in zip(jax.tree_util.tree_leaves_with_path(state),
                                    jax.tree_util.tree_leaves(self.state))
               if a.shape != b.shape]
        if bad:
            raise ValueError(
                f"checkpoint {ckpt_dir!r} leaf shapes differ from the "
                f"serving state at {bad[:3]} (+{max(0, len(bad) - 3)} more); "
                f"reload refused")
        if self.mesh is None:
            state = jax.device_put(state)
        else:
            from fmri_tpu.parallel.mesh import shard_state

            state = shard_state(state, self.mesh, voxel_tp=self.voxel_tp)
        with self._lock:
            self.state = state
        return {"reloaded": ckpt_dir, "epoch": meta.get("epoch")}

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, family: str, stage: int,
                        preset: str = "res64", *, epoch: Optional[int] = None,
                        num_voxels: Optional[int] = None,
                        **kw) -> "ServingModel":
        from fmri_tpu.checkpoints.store import load_eval_state
        from fmri_tpu.configs import get_config

        cfg = get_config(preset)
        if num_voxels is not None:
            from fmri_tpu.configs.presets import override_num_voxels

            cfg = override_num_voxels(cfg, num_voxels)
        state, _meta = load_eval_state(ckpt_dir, epoch=epoch)
        return cls(family, stage, cfg, state, **kw)


class ServerOverloaded(RuntimeError):
    """Raised by :meth:`BatchingServer.submit` when the pending queue is at
    ``max_queue`` — explicit load shedding instead of unbounded growth (a
    client past saturation gets an immediate error, not a latency cliff)."""


class BatchingServer:
    """Dynamic microbatcher over a :class:`ServingModel`.

    ``submit`` enqueues one sample and returns a ``Future``; a single worker
    thread drains the queue into padded bucket batches (full bucket or
    ``max_wait_ms`` after the first queued request, whichever first) and
    resolves the futures with per-sample images.

    Overload governance: the queue is bounded at ``max_queue`` pending
    samples (default ``8 * max_batch``); past that, :meth:`submit` raises
    :class:`ServerOverloaded` (the socket layer returns a ``"shed": true``
    error).  Worst-case queued latency is therefore bounded by roughly
    ``max_queue / max_batch`` model batches.  :meth:`close` drains queued
    work by default before stopping, so no accepted request is dropped on
    shutdown.
    """

    _LAT_WINDOW = 2048

    def __init__(self, model: ServingModel, *, max_wait_ms: float = 5.0,
                 max_queue: Optional[int] = None):
        self.model = model
        self.max_wait = max(0.0, float(max_wait_ms)) / 1e3
        self.max_queue = int(max_queue if max_queue is not None
                             else 8 * model.max_batch)
        if self.max_queue < 1:
            raise ValueError("max_queue must be >= 1")
        self._q: "queue.Queue" = queue.Queue(maxsize=self.max_queue)
        self._stop = threading.Event()
        self._closing = threading.Event()
        self._slock = threading.Lock()
        self._requests = 0
        self._batches = 0
        self._shed = 0
        self._occupancy_sum = 0.0
        self._lat_ms: List[float] = []
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="fmri-tpu-batcher")
        self._thread.start()

    def submit(self, x) -> Future:
        import numpy as np

        x = np.asarray(x, np.float32)
        want = self.model.sample_shape()
        if x.shape != want:
            raise ValueError(f"sample shape {x.shape} != expected {want}")
        fut: Future = Future()
        # The closing check and the enqueue are one critical section with
        # close()'s _closing.set(): otherwise a submit could pass the check,
        # lose the CPU, and enqueue AFTER close()'s fail-fast sweep emptied
        # the queue — an orphaned Future that never resolves.
        with self._slock:
            if self._closing.is_set():
                raise RuntimeError("server is shutting down")
            try:
                self._q.put_nowait((x, fut, time.monotonic()))
            except queue.Full:
                self._shed += 1
                raise ServerOverloaded(
                    f"queue depth at max_queue={self.max_queue}; retry with "
                    f"backoff") from None
        return fut

    def _loop(self) -> None:
        import numpy as np

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.model.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            xs = np.stack([b[0] for b in batch])
            try:
                ys = self.model.reconstruct(xs)
            except Exception as exc:  # resolve every waiter, keep serving
                for _, fut, _ in batch:
                    if not fut.cancelled():
                        fut.set_exception(exc)
                continue
            done = time.monotonic()
            with self._slock:
                self._requests += len(batch)
                self._batches += 1
                self._occupancy_sum += len(batch) / self.model._bucket_for(
                    len(batch))
                for _, _, t0 in batch:
                    self._lat_ms.append((done - t0) * 1e3)
                del self._lat_ms[:-self._LAT_WINDOW]
            for i, (_, fut, _) in enumerate(batch):
                if not fut.cancelled():
                    fut.set_result(ys[i])

    def stats(self) -> Dict:
        import numpy as np

        with self._slock:
            lat = np.asarray(self._lat_ms, np.float64)
            out = {
                "requests": self._requests,
                "batches": self._batches,
                "shed": self._shed,
                "queue_depth": self._q.qsize(),
                "max_queue": self.max_queue,
                "occupancy": (self._occupancy_sum / self._batches
                              if self._batches else 0.0),
                "buckets": self.model.buckets,
                "max_wait_ms": self.max_wait * 1e3,
            }
        if len(lat):
            out["latency_ms"] = {
                "p50": float(np.percentile(lat, 50)),
                "p95": float(np.percentile(lat, 95)),
                "p99": float(np.percentile(lat, 99)),
                "mean": float(lat.mean()),
            }
        return out

    def close(self, drain: bool = True, timeout: float = 30.0) -> None:
        """Stop the worker.  With ``drain`` (default), first reject new
        submissions and let the worker finish every queued request (bounded
        by ``timeout``); any request still queued afterwards fails fast with
        an exception instead of hanging its Future forever."""
        with self._slock:  # fence against in-flight submit() enqueues
            self._closing.set()
        if drain:
            deadline = time.monotonic() + timeout
            while not self._q.empty() and time.monotonic() < deadline:
                time.sleep(0.01)
        self._stop.set()
        self._thread.join(timeout=5)
        while True:  # fail anything the drain window didn't cover
            try:
                _, fut, _ = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.cancelled():
                fut.set_exception(RuntimeError("server shut down before "
                                               "this request ran"))


# --------------------------- socket transport ---------------------------


def _encode_image(img) -> Dict:
    import numpy as np

    if img.dtype == np.uint8:
        u8 = img
    else:
        u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return {"shape": list(u8.shape), "dtype": "uint8",
            "data": base64.b64encode(u8.tobytes()).decode("ascii")}


class _Handler(socketserver.StreamRequestHandler):
    # One generate request may hold the model lock for at most this many
    # max_batch-sized TPU batches — a protocol-level cap so a single client
    # cannot stall reconstruct traffic indefinitely (the in-process
    # ``ServingModel.generate`` bulk API stays uncapped).
    GENERATE_CAP_BATCHES = 8

    def handle(self) -> None:
        import numpy as np

        batcher: BatchingServer = self.server.batcher  # type: ignore[attr-defined]
        for line in self.rfile:
            line = line.strip()
            if not line:
                continue
            req = None
            try:
                req = json.loads(line)
                if req.get("cmd") == "stats":
                    resp = batcher.stats()
                elif req.get("cmd") == "ping":
                    resp = {"ok": True}
                elif req.get("cmd") == "reload":
                    if not getattr(self.server, "allow_reload", True):
                        raise PermissionError(
                            "reload is disabled on non-loopback TCP binds; "
                            "start the server with --allow-remote-reload to "
                            "accept remote weight swaps")
                    resp = batcher.model.reload(req["ckpt"],
                                                epoch=req.get("epoch"))
                elif req.get("cmd") == "generate":
                    n = int(req.get("n", 1))
                    cap = self.GENERATE_CAP_BATCHES * batcher.model.max_batch
                    if n > cap:
                        raise ValueError(
                            f"generate n={n} exceeds the per-request cap "
                            f"{cap}; split into multiple requests")
                    imgs = batcher.model.generate(n)
                    resp = {"id": req.get("id"), **_encode_image(imgs)}
                else:
                    key = ("fmri" if batcher.model.data_kind == "pair"
                           else "image")
                    x = np.asarray(req[key], np.float32).reshape(
                        batcher.model.sample_shape())
                    img = batcher.submit(x).result(timeout=60)
                    resp = {"id": req.get("id"), **_encode_image(img)}
            except ServerOverloaded as exc:
                resp = {"id": req.get("id") if isinstance(req, dict) else None,
                        "error": f"ServerOverloaded: {exc}", "shed": True}
            except Exception as exc:
                resp = {"id": req.get("id") if isinstance(req, dict) else None,
                        "error": f"{type(exc).__name__}: {exc}"}
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()


class _ThreadingTCP(socketserver.ThreadingMixIn, socketserver.TCPServer):
    allow_reuse_address = True
    daemon_threads = True


if hasattr(socketserver, "UnixStreamServer"):
    class _ThreadingUnix(socketserver.ThreadingMixIn,
                         socketserver.UnixStreamServer):
        daemon_threads = True


def make_socket_server(batcher: BatchingServer, *,
                       unix_path: Optional[str] = None,
                       host: str = "127.0.0.1", port: int = 0,
                       allow_remote_reload: bool = False):
    """Build (not start) the threaded socket server; ``.server_address`` has
    the bound address (useful with port=0).

    ``reload`` is an unauthenticated admin verb, so on a TCP bind beyond
    loopback it is refused unless ``allow_remote_reload`` (deploy such binds
    only behind a trusted network boundary)."""
    if unix_path:
        if not hasattr(socketserver, "UnixStreamServer"):
            raise RuntimeError(
                "unix domain sockets are unsupported on this platform; "
                "use --host/--port (TCP) instead")
        if os.path.exists(unix_path):
            os.unlink(unix_path)
        srv = _ThreadingUnix(unix_path, _Handler)
        srv.allow_reload = True  # filesystem-permission-guarded
    else:
        srv = _ThreadingTCP((host, port), _Handler)
        loopback = host in ("127.0.0.1", "::1", "localhost")
        srv.allow_reload = loopback or allow_remote_reload
    srv.batcher = batcher  # type: ignore[attr-defined]
    return srv


# --------------------------- CLI ---------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--family", choices=["vgan", "wae", "wae-vgan"],
                   default="vgan")
    p.add_argument("--stage", type=int, choices=[1, 2, 3], default=3)
    p.add_argument("--preset", default="res64")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--load-epoch", type=int, default=None)
    p.add_argument("--num-voxels", type=int, default=None,
                   help="override the preset's fMRI voxel count (must match "
                        "the checkpoint's CognitiveEncoder)")
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--min-bucket", type=int, default=1,
                   help="smallest compiled batch bucket (fewer compiles on "
                        "TPU at the cost of more padding for tiny batches)")
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--max-queue", type=int, default=None,
                   help="pending-request bound before load shedding "
                        "(default 8 x max-batch); past it, requests get an "
                        "immediate 'shed' error instead of queuing unboundedly")
    p.add_argument("--allow-remote-reload", action="store_true",
                   help="accept the (unauthenticated) reload verb on "
                        "non-loopback TCP binds; off by default")
    p.add_argument("--sample", action="store_true",
                   help="reparameterize instead of decoding the mean latent")
    p.add_argument("--output", choices=["uint8", "float"], default="uint8",
                   help="on-device quantization of served images (uint8 = 4x "
                        "smaller device->host transfer; default)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard every bucket over a data mesh spanning all "
                        "local devices (throughput-scale serving)")
    p.add_argument("--mesh", default=None, metavar="data=N,model=M",
                   help="explicit serving mesh; model>1 turns on voxel "
                        "tensor parallelism for cognitive checkpoints "
                        "(fc1 [voxels -> model] sharding, same layout as "
                        "training stage 2/3)")
    p.add_argument("--unix-socket", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7717)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _apply_platform_override()
    from fmri_tpu.utils.compile_cache import enable as _compile_cache
    _compile_cache()  # persistent XLA cache: 12x faster cold starts

    mesh, voxel_tp = None, False
    if args.mesh:
        from fmri_tpu.train.run import _parse_mesh

        mesh, voxel_tp = _parse_mesh(args.mesh)
    elif args.data_parallel:
        from fmri_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    model = ServingModel.from_checkpoint(
        args.ckpt, args.family, args.stage, args.preset,
        epoch=args.load_epoch, num_voxels=args.num_voxels,
        max_batch=args.max_batch,
        min_bucket=args.min_bucket, sample=args.sample, seed=args.seed,
        mesh=mesh, voxel_tp=voxel_tp, output=args.output)
    if not args.no_warmup:
        t0 = time.monotonic()
        model.warmup()
        print(f"warmup: {2 * len(model.buckets)} programs "
              f"({len(model.buckets)} buckets x reconstruct+generate) "
              f"compiled in {time.monotonic() - t0:.1f}s", flush=True)
    batcher = BatchingServer(model, max_wait_ms=args.max_wait_ms,
                             max_queue=args.max_queue)
    srv = make_socket_server(batcher, unix_path=args.unix_socket,
                             host=args.host, port=args.port,
                             allow_remote_reload=args.allow_remote_reload)
    where = args.unix_socket or "%s:%d" % srv.server_address[:2]
    print(f"serving {args.family} stage {args.stage} ({args.preset}) on "
          f"{where}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        batcher.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
