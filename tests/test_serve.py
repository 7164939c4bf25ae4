"""Serving subsystem tests (fmri_tpu/eval/serve.py).

Covers the bucketed static-shape batching (padding exactness, chunking),
the dynamic microbatcher (futures, stats), the NDJSON socket protocol, and
the CLI entry point — all on the tiny preset, CPU backend (conftest).
"""

import base64
import json
import os
import socket
import subprocess
import sys
import threading

import numpy as np
import pytest

from fmri_tpu.configs import get_config
from fmri_tpu.eval.serve import (
    BatchingServer, ServingModel, batch_buckets, make_socket_server,
)


def test_batch_buckets():
    assert batch_buckets(1) == [1]
    assert batch_buckets(8) == [1, 2, 4, 8]
    assert batch_buckets(12) == [1, 2, 4, 8, 12]
    assert batch_buckets(8, min_bucket=2) == [2, 4, 8]
    assert batch_buckets(8, min_bucket=8) == [8]
    with pytest.raises(ValueError):
        batch_buckets(0)


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    """Tiny vgan stage-1 and stage-2 states saved as checkpoints (fresh
    cognitive encoder grafted onto a fresh stage-1 triplet — weights
    untrained; serving only needs the graph + shapes)."""
    from fmri_tpu.checkpoints.store import save_checkpoint
    from fmri_tpu.train import stages

    cfg = get_config("tiny")
    d1 = str(tmp_path_factory.mktemp("serve_s1") / "ckpt")
    state1, _, _ = stages.vgan_stage1(cfg, steps_per_epoch=1, donate=False)
    save_checkpoint(d1, 0, state1)
    d2 = str(tmp_path_factory.mktemp("serve_s2") / "ckpt")
    state2, _, _ = stages.vgan_stage2(cfg, d1, steps_per_epoch=1, donate=False)
    save_checkpoint(d2, 0, state2)
    return d1, d2, cfg


@pytest.fixture(scope="module")
def stage2_ckpt(ckpts):
    d1, d2, cfg = ckpts
    return d2, cfg


@pytest.fixture(scope="module")
def model(stage2_ckpt):
    d2, _cfg = stage2_ckpt
    return ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=8)


def test_padding_exact(model):
    """Bucket padding must not perturb real rows (eval BN = running stats)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, *model.sample_shape())).astype(np.float32)
    batched = model.reconstruct(x)                      # bucket 4, 1 pad row
    singles = np.stack([model.reconstruct(x[i]) for i in range(3)])
    np.testing.assert_allclose(batched, singles, atol=1e-5)


def test_chunking_and_range(model):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(11, *model.sample_shape())).astype(np.float32)
    out = model.reconstruct(x)                          # chunks 8 + pad-to-4
    s = model.cfg.model.image_size
    assert out.shape == (11, s, s, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # chunked result == one-shot per-chunk results
    np.testing.assert_allclose(out[:8], model.reconstruct(x[:8]), atol=1e-5)
    np.testing.assert_allclose(out[8:], model.reconstruct(x[8:]), atol=1e-5)


def test_empty_batch_reconstruct(model):
    """A zero-row batch is degenerate but valid: empty result, no crash."""
    out = model.reconstruct(np.zeros((0, *model.sample_shape()), np.float32))
    s = model.cfg.model.image_size
    assert out.shape == (0, s, s, 3)
    assert out.dtype == np.float32


def test_sampling_rng_threads_through_pipeline(stage2_ckpt):
    """``sample=True``: the reparameterization key is split INSIDE the
    compiled program (no eager per-call ops on the tunneled TPU) and carried
    device-resident across calls — fresh eps every call, deterministic
    replay from the same seed."""
    d2, _cfg = stage2_ckpt
    x = np.random.default_rng(2).normal(
        size=(2, _cfg.model.num_voxels)).astype(np.float32)
    m = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=4,
                                     sample=True, seed=3)
    a, b = m.reconstruct(x), m.reconstruct(x)
    assert np.abs(a - b).max() > 0          # key advanced between calls
    m2 = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=4,
                                      sample=True, seed=3)
    np.testing.assert_allclose(m2.reconstruct(x), a, atol=1e-6)


def test_warmup_covers_generate(stage2_ckpt):
    """warmup() must pre-compile the prior-sampling programs too, so the
    first {"cmd": "generate"} cannot stall live traffic behind an XLA
    compile while holding the model lock."""
    d2, _cfg = stage2_ckpt
    m = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=4)
    assert m._gen._cache_size() == 0
    m.warmup()
    assert m._pipeline._cache_size() == len(m.buckets)
    assert m._gen._cache_size() == len(m.buckets)
    a = m.generate(3)
    assert m._gen._cache_size() == len(m.buckets)   # steady state: no compile
    # warmup must not perturb the sampling stream: a no-warmup server with
    # the same seed generates the same images
    m2 = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=4)
    np.testing.assert_array_equal(m2.generate(3), a)


def test_image_kind_serving(ckpts):
    """Stage-1 serving (image->image autoencode): the data_kind='image'
    branch normalizes the input inside the compiled pipeline."""
    d1, _d2, cfg = ckpts
    m = ServingModel.from_checkpoint(d1, "vgan", 1, "tiny", max_batch=4)
    assert m.data_kind == "image"
    s = cfg.model.image_size
    assert m.sample_shape() == (s, s, 3)
    x = np.random.default_rng(5).uniform(size=(3, s, s, 3)).astype(np.float32)
    out = m.reconstruct(x)
    assert out.shape == (3, s, s, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # matches eval_step + denormalize directly
    import jax

    from fmri_tpu.data.transforms import denormalize, eval_preprocess
    from fmri_tpu.eval.inference import make_eval_step

    step, _ = make_eval_step("vgan", 1, cfg)
    ref = denormalize(
        step(m.state, eval_preprocess(x, cfg.data.mean, cfg.data.std), None),
        cfg.data.mean, cfg.data.std)
    np.testing.assert_allclose(out, np.clip(np.asarray(ref), 0, 1), atol=1e-5)


def test_generate(model):
    """Prior sampling: bucketed, rng advances between calls."""
    a = model.generate(3)
    s = model.cfg.model.image_size
    assert a.shape == (3, s, s, 3)
    assert 0.0 <= a.min() and a.max() <= 1.0
    b = model.generate(3)
    assert np.abs(a - b).max() > 0  # fresh z each call
    big = model.generate(11)        # > max_batch: chunked
    assert big.shape == (11, s, s, 3)
    with pytest.raises(ValueError):
        model.generate(0)


def test_uint8_output(model, stage2_ckpt):
    """On-device uint8 quantization matches the host-side conversion."""
    d2, _cfg = stage2_ckpt
    u8 = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=8,
                                      output="uint8")
    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, *model.sample_shape())).astype(np.float32)
    got = u8.reconstruct(x)
    assert got.dtype == np.uint8
    want = np.clip(model.reconstruct(x) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    # device-side vs host-side rounding may differ on exact .5 boundaries
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    with pytest.raises(ValueError):
        ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", output="int8")


def test_data_parallel_serving_matches_single_device(model, stage2_ckpt):
    """DP serving (8-virtual-device mesh) returns the single-device images."""
    import jax

    from fmri_tpu.parallel.mesh import make_mesh

    d2, _cfg = stage2_ckpt
    mesh = make_mesh()
    ndev = int(mesh.devices.size)
    assert ndev == len(jax.devices())
    dp = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny",
                                      max_batch=2 * ndev, mesh=mesh)
    assert all(b % ndev == 0 for b in dp.buckets)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, *dp.sample_shape())).astype(np.float32)
    np.testing.assert_allclose(dp.reconstruct(x), model.reconstruct(x),
                               atol=1e-5)
    with pytest.raises(ValueError):
        ServingModel.from_checkpoint(d2, "vgan", 2, "tiny",
                                     max_batch=ndev + 1, mesh=mesh)


def test_voxel_tp_serving_matches_single_device(model, stage2_ckpt):
    """dp x voxel-TP serving (fc1 [voxels -> model] sharding, the training
    stage-2 layout) returns the single-device images; generate and reload
    work under the sharded state."""
    from fmri_tpu.parallel.mesh import make_mesh

    d2, cfg = stage2_ckpt
    mesh = make_mesh(data=4, model=2)
    tp = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=8,
                                      mesh=mesh, voxel_tp=True)
    assert all(b % 4 == 0 for b in tp.buckets)  # data-axis multiple, not 8
    # the fc1 kernel is actually sharded over the model axis
    k = tp.state.params["encoder"]["fc1"]["kernel"]
    assert len(k.sharding.device_set) == 8
    assert k.sharding.shard_shape(k.shape)[0] == cfg.model.num_voxels // 2
    rng = np.random.default_rng(4)
    x = rng.normal(size=(5, *tp.sample_shape())).astype(np.float32)
    np.testing.assert_allclose(tp.reconstruct(x), model.reconstruct(x),
                               atol=1e-5)
    g = tp.generate(3)
    assert g.shape == (3, cfg.model.image_size, cfg.model.image_size, 3)
    tp.reload(d2)   # re-shards with voxel_tp
    np.testing.assert_allclose(tp.reconstruct(x), model.reconstruct(x),
                               atol=1e-5)


def test_voxel_tp_validation(ckpts):
    from fmri_tpu.parallel.mesh import make_mesh

    d1, d2, _cfg = ckpts
    with pytest.raises(ValueError):   # no mesh
        ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", voxel_tp=True)
    with pytest.raises(ValueError):   # image-kind checkpoint
        ServingModel.from_checkpoint(d1, "vgan", 1, "tiny", max_batch=8,
                                     mesh=make_mesh(data=4, model=2),
                                     voxel_tp=True)


def test_batching_server_futures_and_stats(model):
    srv = BatchingServer(model, max_wait_ms=20.0)
    try:
        rng = np.random.default_rng(2)
        xs = rng.normal(size=(6, *model.sample_shape())).astype(np.float32)
        futs = [srv.submit(xs[i]) for i in range(6)]
        outs = np.stack([f.result(timeout=60) for f in futs])
        np.testing.assert_allclose(outs, model.reconstruct(xs), atol=1e-5)
        st = srv.stats()
        assert st["requests"] == 6
        assert st["batches"] >= 1
        assert 0 < st["occupancy"] <= 1.0
        assert st["latency_ms"]["p50"] > 0
    finally:
        srv.close()


def test_hot_reload(stage2_ckpt, tmp_path):
    """Weight hot-swap: after reload the server answers with the new model's
    outputs (compiled programs reused, only buffers change)."""
    import dataclasses

    import jax

    from fmri_tpu.checkpoints.store import load_eval_state, save_checkpoint

    d2, cfg = stage2_ckpt
    m = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=4)
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, *m.sample_shape())).astype(np.float32)
    before = m.reconstruct(x)
    # "new" checkpoint = same graph, decoder params visibly shifted
    # (fresh random inits all decode near-constant gray, so a re-init would
    # not move the output; a bias shift provably does)
    state, _meta = load_eval_state(d2)
    params = dict(state.params)
    params["decoder"] = jax.tree_util.tree_map(lambda p: p + 0.1,
                                               params["decoder"])
    d2b = str(tmp_path / "s2b")
    save_checkpoint(d2b, 3, dataclasses.replace(state, params=params))
    info = m.reload(d2b)
    assert info["epoch"] == 3
    after = m.reconstruct(x)
    assert np.abs(after - before).max() > 1e-3
    fresh = ServingModel.from_checkpoint(d2b, "vgan", 2, "tiny", max_batch=4)
    np.testing.assert_allclose(after, fresh.reconstruct(x), atol=1e-5)


def test_batching_server_concurrent_stress(model):
    """Many client threads submitting at once: every future resolves and
    every result matches the direct single-sample computation."""
    rng = np.random.default_rng(13)
    xs = rng.normal(size=(40, *model.sample_shape())).astype(np.float32)
    want = model.reconstruct(xs)
    srv = BatchingServer(model, max_wait_ms=3.0)
    results = [None] * len(xs)
    errors = []

    def client(lo, hi):
        try:
            futs = [(i, srv.submit(xs[i])) for i in range(lo, hi)]
            for i, f in futs:
                results[i] = f.result(timeout=60)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    try:
        threads = [threading.Thread(target=client, args=(lo, lo + 10))
                   for lo in range(0, 40, 10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        got = np.stack(results)
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert srv.stats()["requests"] == 40
    finally:
        srv.close()


def test_batching_server_rejects_bad_shape(model):
    srv = BatchingServer(model)
    try:
        with pytest.raises(ValueError):
            srv.submit(np.zeros(7, np.float32))
    finally:
        srv.close()


def _request(sock_file_r, sock_file_w, obj):
    sock_file_w.write((json.dumps(obj) + "\n").encode())
    sock_file_w.flush()
    return json.loads(sock_file_r.readline())


def test_socket_protocol(model, tmp_path):
    path = str(tmp_path / "serve.sock")
    batcher = BatchingServer(model, max_wait_ms=2.0)
    srv = make_socket_server(batcher, unix_path=path)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(path)
        r, w = c.makefile("rb"), c.makefile("wb")
        assert _request(r, w, {"cmd": "ping"}) == {"ok": True}
        v = np.zeros(model.sample_shape(), np.float32)
        resp = _request(r, w, {"id": 42, "fmri": v.tolist()})
        assert resp["id"] == 42 and resp["dtype"] == "uint8"
        s = model.cfg.model.image_size
        img = np.frombuffer(base64.b64decode(resp["data"]), np.uint8)
        assert img.reshape(resp["shape"]).shape == (s, s, 3)
        # matches the direct path (uint8 round trip)
        direct = np.clip(model.reconstruct(v) * 255.0 + 0.5,
                         0, 255).astype(np.uint8)
        np.testing.assert_array_equal(img.reshape(s, s, 3), direct)
        # malformed request -> error response, connection stays usable
        w.write(b'{"bad json\n')
        w.flush()
        assert "error" in json.loads(r.readline())
        assert _request(r, w, {"cmd": "ping"}) == {"ok": True}
        stats = _request(r, w, {"cmd": "stats"})
        assert stats["requests"] >= 1
        # prior-sampling command
        gen = _request(r, w, {"cmd": "generate", "n": 2})
        assert gen["shape"] == [2, s, s, 3] and gen["dtype"] == "uint8"
        c.close()
    finally:
        srv.shutdown()
        batcher.close()


def test_serve_client(model, tmp_path):
    """fmri_tpu.eval.client.ServeClient: numpy API over the NDJSON socket —
    batch fan-out over the connection pool, order preservation, generate,
    stats, and error surfacing."""
    from fmri_tpu.eval.client import ServeClient, ServeError

    path = str(tmp_path / "client.sock")
    batcher = BatchingServer(model, max_wait_ms=2.0)
    srv = make_socket_server(batcher, unix_path=path)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with ServeClient(unix_path=path, pool=4) as c:
            assert c.ping()
            rng = np.random.default_rng(3)
            x = rng.normal(size=(5, *model.sample_shape())).astype(np.float32)
            imgs = c.reconstruct(x)
            s = model.cfg.model.image_size
            assert imgs.shape == (5, s, s, 3) and imgs.dtype == np.uint8
            # order-preserving and equal to the direct path per sample
            want = np.clip(model.reconstruct(x) * 255.0 + 0.5,
                           0, 255).astype(np.uint8)
            np.testing.assert_array_equal(imgs, want)
            single = c.reconstruct(x[2])
            np.testing.assert_array_equal(single, want[2])
            gen = c.generate(3)
            assert gen.shape == (3, s, s, 3) and gen.dtype == np.uint8
            assert c.stats()["requests"] >= 6
            with pytest.raises(ServeError):
                c.reconstruct(np.zeros(7, np.float32))  # wrong voxel count
    finally:
        srv.shutdown()
        batcher.close()


def test_serve_cli(stage2_ckpt, tmp_path):
    """End-to-end: spawn the CLI server, round-trip one request."""
    d2, cfg = stage2_ckpt
    path = str(tmp_path / "cli.sock")
    env = dict(os.environ, JAX_PLATFORMS="cpu", FMRI_TPU_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "fmri_tpu.eval.serve", "--family", "vgan",
         "--stage", "2", "--preset", "tiny", "--ckpt", d2,
         "--max-batch", "4", "--unix-socket", path, "--no-warmup"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
    try:
        deadline = 120
        import time

        t0 = time.monotonic()
        while not os.path.exists(path):
            if proc.poll() is not None or time.monotonic() - t0 > deadline:
                raise AssertionError(
                    "server did not start: %s" % proc.stdout.read())
            time.sleep(0.2)
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(path)
        r, w = c.makefile("rb"), c.makefile("wb")
        v = np.zeros(cfg.model.num_voxels, np.float32)
        resp = _request(r, w, {"id": 1, "fmri": v.tolist()})
        assert resp["id"] == 1 and resp["dtype"] == "uint8"
        c.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)


# ------------------- overload governance (round-3 additions) -------------------


class _GatedModel:
    """Deterministic stand-in for ServingModel: reconstruct blocks until
    released, so queue depth is controlled exactly (no timing races)."""

    max_batch = 4
    buckets = [4]

    def __init__(self):
        self.entered = threading.Event()
        self.release = threading.Event()

    def sample_shape(self):
        return (3,)

    def _bucket_for(self, n):
        return self.max_batch

    def reconstruct(self, xs):
        self.entered.set()
        assert self.release.wait(timeout=60)
        return np.zeros((len(xs), 2, 2, 3), np.float32)


def test_backpressure_sheds_load():
    """Bounded queue: submissions past max_queue raise ServerOverloaded
    immediately (explicit shed, not unbounded growth); accepted requests all
    complete once capacity frees up."""
    from fmri_tpu.eval.serve import ServerOverloaded

    m = _GatedModel()
    srv = BatchingServer(m, max_wait_ms=0.0, max_queue=3)
    try:
        first = srv.submit(np.zeros(3, np.float32))
        assert m.entered.wait(timeout=10)  # worker is now blocked in-model
        queued = [srv.submit(np.zeros(3, np.float32)) for _ in range(3)]
        with pytest.raises(ServerOverloaded):
            srv.submit(np.zeros(3, np.float32))
        st = srv.stats()
        assert st["shed"] == 1 and st["max_queue"] == 3
        assert st["queue_depth"] == 3
        m.release.set()
        for f in [first, *queued]:
            assert f.result(timeout=30).shape == (2, 2, 3)
        assert srv.stats()["shed"] == 1  # sheds are not retried internally
    finally:
        m.release.set()
        srv.close()


def test_close_drains_accepted_requests():
    """Shutdown drains: every accepted Future resolves with a result."""
    m = _GatedModel()
    m.release.set()  # model is fast; requests just need the worker to drain
    srv = BatchingServer(m, max_wait_ms=0.0, max_queue=64)
    futs = [srv.submit(np.zeros(3, np.float32)) for _ in range(16)]
    srv.close()  # default drain=True
    for f in futs:
        assert f.result(timeout=1).shape == (2, 2, 3)
    with pytest.raises(RuntimeError, match="shutting down"):
        srv.submit(np.zeros(3, np.float32))


def test_close_without_drain_fails_pending_fast():
    """drain=False: queued-but-unrun requests fail with an explicit error
    instead of hanging their futures forever."""
    m = _GatedModel()
    srv = BatchingServer(m, max_wait_ms=0.0, max_queue=64)
    first = srv.submit(np.zeros(3, np.float32))
    assert m.entered.wait(timeout=10)
    pending = [srv.submit(np.zeros(3, np.float32)) for _ in range(5)]
    m.release.set()
    srv.close(drain=False)
    for f in [first, *pending]:
        try:  # each future resolves promptly — result or explicit error
            f.result(timeout=10)
        except RuntimeError as e:
            assert "shut down" in str(e)


def test_socket_hammer_past_saturation(model, tmp_path):
    """Hammer the socket server well past max_queue: every response is
    either a valid image or a clean {"shed": true} rejection, some load IS
    shed, and the queue stays bounded."""
    path = str(tmp_path / "hammer.sock")
    batcher = BatchingServer(model, max_wait_ms=200.0, max_queue=6)
    srv = make_socket_server(batcher, unix_path=path)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    ok, shed, bad = [], [], []

    def client(k):
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(path)
        r, w = c.makefile("rb"), c.makefile("wb")
        v = np.zeros(model.sample_shape(), np.float32)
        for i in range(4):
            resp = _request(r, w, {"id": 100 * k + i, "fmri": v.tolist()})
            if resp.get("shed"):
                shed.append(resp)
            elif "data" in resp:
                ok.append(resp)
            else:  # pragma: no cover - failure detail
                bad.append(resp)
        c.close()

    try:
        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert not bad, bad[:2]
        assert len(ok) + len(shed) == 32
        assert shed, "expected load shedding past saturation"
        assert ok, "some requests must still be served at saturation"
        st = batcher.stats()
        assert st["shed"] == len(shed)
        assert st["queue_depth"] <= st["max_queue"]
    finally:
        srv.shutdown()
        batcher.close()


def test_generate_capped_per_request(model, tmp_path):
    """The socket generate verb refuses n beyond 8 x max_batch so one client
    cannot monopolize the model lock (ADVICE r2; in-process bulk generate is
    uncapped)."""
    path = str(tmp_path / "gencap.sock")
    batcher = BatchingServer(model, max_wait_ms=1.0)
    srv = make_socket_server(batcher, unix_path=path)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(path)
        r, w = c.makefile("rb"), c.makefile("wb")
        resp = _request(r, w, {"cmd": "generate",
                               "n": 8 * model.max_batch + 1})
        assert "error" in resp and "cap" in resp["error"]
        resp = _request(r, w, {"cmd": "generate", "n": 2})
        assert resp["shape"][0] == 2
        c.close()
    finally:
        srv.shutdown()
        batcher.close()


def test_remote_reload_guard(model):
    """reload is refused on non-loopback TCP binds unless explicitly
    allowed (unauthenticated admin verb, ADVICE r2)."""
    batcher = BatchingServer(model, max_wait_ms=1.0)
    try:
        srv = make_socket_server(batcher, host="127.0.0.1", port=0)
        assert srv.allow_reload
        srv.server_close()
        srv = make_socket_server(batcher, host="0.0.0.0", port=0)
        assert not srv.allow_reload
        # one live round trip through the guard
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            port = srv.server_address[1]
            c = socket.create_connection(("127.0.0.1", port))
            r, w = c.makefile("rb"), c.makefile("wb")
            resp = _request(r, w, {"cmd": "reload", "ckpt": "/nope"})
            assert "PermissionError" in resp["error"]
            c.close()
        finally:
            srv.shutdown()
        srv = make_socket_server(batcher, host="0.0.0.0", port=0,
                                 allow_remote_reload=True)
        assert srv.allow_reload
        srv.server_close()
    finally:
        batcher.close()


def test_reload_rejects_mismatched_checkpoint(ckpts, stage2_ckpt):
    """A checkpoint with a different state tree (stage-1 vs stage-2) or
    different leaf shapes (other voxel count) is refused and the serving
    state is untouched (ADVICE r2: no broken hot-swap)."""
    from fmri_tpu.checkpoints.store import save_checkpoint
    from fmri_tpu.configs.presets import override_num_voxels
    from fmri_tpu.train import stages

    d1, d2, cfg = ckpts
    m = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=4)
    rng = np.random.default_rng(17)
    x = rng.normal(size=(2, *m.sample_shape())).astype(np.float32)
    before = m.reconstruct(x)
    with pytest.raises(ValueError, match="reload refused"):
        m.reload(d1)  # stage-1 tree (no cognitive encoder groups)
    import tempfile

    cfg_v = override_num_voxels(cfg, cfg.model.num_voxels + 8)
    with tempfile.TemporaryDirectory() as td:
        dv = os.path.join(td, "ckpt")
        sv, _, _ = stages.vgan_stage2(cfg_v, d1, steps_per_epoch=1,
                                      donate=False)
        save_checkpoint(dv, 0, sv)
        with pytest.raises(ValueError, match="reload refused"):
            m.reload(dv)  # same tree, different fc1 shape
    np.testing.assert_array_equal(m.reconstruct(x), before)


def test_warmup_preserves_sampling_stream(stage2_ckpt):
    """With sample=True, warmup must not advance the carried reparam key:
    outputs depend on the seed alone, warmed up or not (ADVICE r2)."""
    d2, cfg = stage2_ckpt
    rng = np.random.default_rng(19)
    x = rng.normal(size=(2, cfg.model.num_voxels)).astype(np.float32)
    m1 = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=4,
                                      sample=True, seed=5)
    m1.warmup()
    a = m1.reconstruct(x)
    m2 = ServingModel.from_checkpoint(d2, "vgan", 2, "tiny", max_batch=4,
                                      sample=True, seed=5)
    b = m2.reconstruct(x)
    np.testing.assert_allclose(a, b, atol=1e-6)
