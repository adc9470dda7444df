"""Serving daemon tests: micro-batching dispatcher + HTTP surface.

The server is a beyond-reference production component (the reference only
ships batch-run CLIs); these tests pin its contract: coalescing/padding
semantics, backpressure, error propagation, graceful drain, and HTTP
end-to-end equality with the direct engine path.
"""

import json
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satlas_sr_tpu.archs import RRDBNet
from satlas_sr_tpu.serve import MicroBatcher, QueueFullError, build_server
from satlas_sr_tpu.utils import torch_io
from satlas_sr_tpu.utils.imgio import encode_png_bytes, read_png_bytes
from satlas_sr_tpu.utils.infer_utils import format_s2naip_data

N_FRAMES = 2


def _serve_opt(tmp_path):
    model = RRDBNet(num_in_ch=N_FRAMES * 3, num_out_ch=3, num_feat=8,
                    num_block=1, num_grow_ch=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, N_FRAMES * 3)))
    weights = str(tmp_path / "net_g.pth")
    torch_io.save_torch_state_dict(
        weights, torch_io.rrdbnet_to_torch(variables), param_key="params_ema")
    return {
        "n_lr_images": N_FRAMES,
        "scale": 4,
        "batch_size": 8,
        "manual_seed": 7,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": N_FRAMES * 3,
                      "num_out_ch": 3, "num_feat": 8, "num_block": 1,
                      "num_grow_ch": 4},
        "path": {"pretrain_network_g": weights, "param_key_g": "params_ema",
                 "strict_load_g": True},
    }


def _post(url, body, accept=None, method="POST"):
    req = urllib.request.Request(url, data=body, method=method)
    if accept:
        req.add_header("Accept", accept)
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


@pytest.fixture
def running_server(tmp_path):
    opt = _serve_opt(tmp_path)
    server, batcher = build_server(opt, host="127.0.0.1", port=0,
                                   max_wait_ms=20.0, timeout_s=120.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        yield base, server, batcher, opt
    finally:
        server.shutdown()
        server.server_close()
        batcher.close()
        thread.join(timeout=10)


def test_serve_end_to_end_matches_engine(running_server, rng):
    base, server, batcher, opt = running_server
    series = [(rng.rand(4 * 32, 32, 3) * 254 + 1).astype(np.uint8)
              for _ in range(6)]
    formatted = np.stack([
        format_s2naip_data(s, N_FRAMES,
                           rng=np.random.RandomState(opt["manual_seed"]))[0]
        for s in series])
    expected = batcher.engine.run(formatted)

    bodies = [encode_png_bytes(s) for s in series]
    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(lambda b: _post(base + "/v1/sr", b), bodies))
    for i, (status, body, headers) in enumerate(results):
        assert status == 200, body
        assert headers["Content-Type"] == "image/png"
        out = read_png_bytes(body)
        assert out.shape == (128, 128, 3)
        # per-sample conv programs are batch-composition independent
        np.testing.assert_array_equal(out, expected[i])


def test_serve_raw_output_and_observability(running_server, rng):
    base, server, batcher, opt = running_server
    s = (rng.rand(4 * 32, 32, 3) * 254 + 1).astype(np.uint8)
    status, body, headers = _post(base + "/v1/sr", encode_png_bytes(s),
                                  accept="application/octet-stream")
    assert status == 200
    assert headers["X-Shape"] == "128,128,3"
    raw = np.frombuffer(body, np.uint8).reshape(128, 128, 3)
    formatted = format_s2naip_data(
        s, N_FRAMES, rng=np.random.RandomState(opt["manual_seed"]))[0]
    np.testing.assert_array_equal(raw, batcher.engine.run(formatted[None])[0])

    status, body, _ = _post(base + "/healthz", None, method="GET")
    health = json.loads(body)
    assert status == 200 and health["status"] == "ok"
    assert health["model"] == "SSR_RRDBNet" and health["n_lr_images"] == N_FRAMES

    status, body, _ = _post(base + "/stats", None, method="GET")
    stats = json.loads(body)
    assert status == 200
    assert stats["requests_total"] >= 1 and stats["batches_total"] >= 1
    assert stats["images_batched"] >= 1
    assert stats["latency_ms"]["count"] >= 1

    # Prometheus twin of /stats: text exposition with the same counters
    status, body, headers = _post(base + "/metrics", None, method="GET")
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    text = body.decode()
    assert "# TYPE sr_requests_total counter" in text
    metrics = {l.split()[0]: float(l.split()[1])
               for l in text.splitlines() if l and not l.startswith("#")}
    assert metrics["sr_requests_total"] == stats["requests_total"]
    assert metrics["sr_batches_total"] >= 1
    assert "sr_latency_ms_p50" in metrics


def test_serve_rejects_bad_requests(running_server, rng):
    base, _, _, _ = running_server
    # not a png
    status, body, _ = _post(base + "/v1/sr", b"this is not a png")
    assert status == 400 and b"PNG" in body
    # wrong geometry (W != 32)
    bad = encode_png_bytes((rng.rand(64, 30, 3) * 255).astype(np.uint8))
    status, body, _ = _post(base + "/v1/sr", bad)
    assert status == 400 and b"[T*32, 32, 3]" in body
    # too few frames (1 < n_lr_images=2)
    short = encode_png_bytes((rng.rand(32, 32, 3) * 254 + 1).astype(np.uint8))
    status, body, _ = _post(base + "/v1/sr", short)
    assert status == 400 and b"frames" in body
    # unknown route
    status, _, _ = _post(base + "/nope", b"x")
    assert status == 404


def test_serve_decode_bomb_rejected(running_server):
    """A body under MAX_BODY_BYTES whose DECODED size exceeds the pixel cap
    is refused from the PNG header, before decompression can allocate."""
    base, _, _, _ = running_server
    # 32 x (513*32) zeros: > MAX_IMAGE_PIXELS decoded, ~2 KB compressed
    bomb = encode_png_bytes(np.zeros((513 * 32, 32, 3), np.uint8))
    assert len(bomb) < 1 << 20
    status, body, _ = _post(base + "/v1/sr", bomb)
    assert status == 400 and b"pixels" in body


def test_serve_error_paths_close_keepalive_connection(running_server):
    """Error responses sent before the body was read must drop the
    connection — otherwise the next keep-alive request on the same socket
    would parse the unread body bytes as a request line (desync)."""
    import http.client

    base, _, _, _ = running_server
    host, port = base.removeprefix("http://").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        # unknown POST route with an (unread) body
        conn.request("POST", "/nope", body=b"x" * 4096)
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        # the server must have closed the socket: a reused connection either
        # raises on send/read or http.client flags the close — it must NOT
        # yield a desynced parse of the stale body bytes.
        try:
            conn.request("GET", "/healthz")
            resp2 = conn.getresponse()
            assert resp2.will_close or resp2.status == 200
        except (http.client.HTTPException, ConnectionError, BrokenPipeError,
                TimeoutError):
            pass
    finally:
        conn.close()


class FakeEngine:
    """Engine stand-in recording batch compositions; y = x + 1."""

    def __init__(self, batch_size=8):
        self.batch_size = batch_size
        self.batches = []
        self.gate = threading.Event()
        self.gate.set()
        self.fail_next = False

    def dispatch(self, batch, bucket=None):
        # bucket= is part of the engine contract (MicroBatcher always
        # passes it); single-shape fakes simply ignore it
        self.gate.wait(timeout=30)
        if self.fail_next:
            self.fail_next = False
            raise RuntimeError("injected dispatch failure")
        self.batches.append(batch.shape[0])
        return batch

    def fetch(self, handle):
        return handle + 1


def test_microbatcher_coalesces_while_device_busy():
    eng = FakeEngine(batch_size=8)
    mb = MicroBatcher(eng, (32, 32, 6), max_wait_ms=5.0, depth=1)
    try:
        x = np.zeros((32, 32, 6), np.uint8)
        eng.gate.clear()                      # hold the device "busy"
        first = mb.submit(x)
        time.sleep(0.1)                       # dispatcher now blocked in dispatch
        later = [mb.submit(x) for _ in range(4)]
        eng.gate.set()
        assert first.result(timeout=30).shape == (32, 32, 6)
        for f in later:
            np.testing.assert_array_equal(f.result(timeout=30),
                                          np.ones((32, 32, 6), np.uint8))
        # the requests queued during the stall coalesced into one batch
        # (tolerate the first going alone OR joining, per thread scheduling)
        assert sum(eng.batches) == 5
        assert len(eng.batches) <= 2 and max(eng.batches) >= 4
    finally:
        mb.close()


def test_microbatcher_backpressure_and_errors():
    eng = FakeEngine(batch_size=4)
    mb = MicroBatcher(eng, (2, 2, 3), max_wait_ms=1.0, max_queue=2, depth=1)
    x = np.zeros((2, 2, 3), np.uint8)
    try:
        with pytest.raises(ValueError):
            mb.submit(np.zeros((3, 3, 3), np.uint8))   # wrong shape
        with pytest.raises(ValueError):
            mb.submit(x.astype(np.float32))            # wrong dtype

        eng.gate.clear()
        inflight = mb.submit(x)
        time.sleep(0.05)
        queued = [mb.submit(x), mb.submit(x)]
        with pytest.raises(QueueFullError):
            mb.submit(x)                               # queue at max_queue=2
        eng.fail_next = True
        eng.gate.set()
        with pytest.raises(RuntimeError, match="injected"):
            inflight.result(timeout=30)
        for f in queued:                               # later batch still fine
            f.result(timeout=30)
    finally:
        mb.close()
    with pytest.raises(RuntimeError):                  # closed -> refuse work
        mb.submit(x)


def test_microbatcher_close_drains_pending():
    eng = FakeEngine(batch_size=4)
    mb = MicroBatcher(eng, (2, 2, 3), max_wait_ms=1000.0, depth=1)
    x = np.zeros((2, 2, 3), np.uint8)
    eng.gate.clear()
    futs = [mb.submit(x) for _ in range(3)]
    threading.Timer(0.1, eng.gate.set).start()
    mb.close()  # must drain everything queued before returning
    assert all(f.done() for f in futs)
    assert sum(eng.batches) == 3


# ------------------------------------------------------- hot reload (round 4)


def _export_tiny_artifact(tmp_path, name, seed):
    """A tiny .ssrx with weights derived from `seed` (distinct outputs)."""
    from satlas_sr_tpu.export import export_artifact
    from satlas_sr_tpu.archs import RRDBNet

    model = RRDBNet(num_in_ch=N_FRAMES * 3, num_out_ch=3, num_feat=8,
                    num_block=1, num_grow_ch=4)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 32, 32, N_FRAMES * 3)))
    weights = str(tmp_path / f"net_g_{name}.pth")
    torch_io.save_torch_state_dict(
        weights, torch_io.rrdbnet_to_torch(variables), param_key="params_ema")
    opt = {
        "n_lr_images": N_FRAMES, "scale": 4, "batch_size": 4,
        "compute_dtype": "float32",
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": N_FRAMES * 3,
                      "num_out_ch": 3, "num_feat": 8, "num_block": 1,
                      "num_grow_ch": 4},
        "path": {"pretrain_network_g": weights, "param_key_g": "params_ema",
                 "strict_load_g": True},
    }
    path = str(tmp_path / f"{name}.ssrx")
    export_artifact(opt, path, platforms=("cpu",))
    return path, opt


def test_admin_reload_swaps_weights_zero_downtime(tmp_path, rng):
    """POST /admin/reload: outputs switch to the new artifact's weights, a
    failed reload keeps the old engine serving, auth is enforced, and
    /healthz reports the rollover generation."""
    art_a, opt = _export_tiny_artifact(tmp_path, "a", seed=0)
    art_b, _ = _export_tiny_artifact(tmp_path, "b", seed=1)

    server, batcher = build_server(
        opt, host="127.0.0.1", port=0, max_wait_ms=5.0, timeout_s=120.0,
        artifact=art_a, admin_token="sekrit")
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        frames = (rng.rand(N_FRAMES * 32, 32, 3) * 254 + 1).astype(np.uint8)
        body = encode_png_bytes(frames)

        code, out_a, _ = _post(f"{base}/v1/sr", body)
        assert code == 200

        # wrong token -> 403; no token header -> 403
        req = urllib.request.Request(
            f"{base}/admin/reload",
            data=json.dumps({"artifact": art_b}).encode(), method="POST")
        req.add_header("X-Admin-Token", "wrong")
        code, _, _ = _post_req(req)
        assert code == 403

        # bad artifact path -> 409, old engine still serving identical bytes
        req = urllib.request.Request(
            f"{base}/admin/reload",
            data=json.dumps({"artifact": str(tmp_path / "nope.ssrx")}).encode(),
            method="POST")
        req.add_header("X-Admin-Token", "sekrit")
        code, msg, _ = _post_req(req)
        assert code == 409 and b"still serving" in msg
        code, out_still, _ = _post(f"{base}/v1/sr", body)
        assert code == 200 and out_still == out_a

        # real rollover
        req = urllib.request.Request(
            f"{base}/admin/reload",
            data=json.dumps({"artifact": art_b}).encode(), method="POST")
        req.add_header("X-Admin-Token", "sekrit")
        code, resp, _ = _post_req(req)
        assert code == 200
        info = json.loads(resp)
        assert info["generation"] == 1 and info["artifact"] == art_b

        code, out_b, _ = _post(f"{base}/v1/sr", body)
        assert code == 200
        assert out_b != out_a  # different weights -> different imagery

        # the new output equals the direct engine path on artifact B
        from satlas_sr_tpu.export import ExportedEngine
        eng_b = ExportedEngine(art_b, batch_size=4)
        stacked, _ = format_s2naip_data(
            frames, N_FRAMES, rng=np.random.RandomState(opt["manual_seed"]
                                                        if "manual_seed" in opt
                                                        else 0))
        direct = eng_b.run(stacked[None])[0]
        np.testing.assert_array_equal(read_png_bytes(out_b), direct)

        code, health, _ = _post(f"{base}/healthz", None, method="GET")
        h = json.loads(health)
        assert h["reload_generation"] == 1 and h["artifact"] == art_b
    finally:
        server.shutdown()
        server.server_close()
        server.ctx["batcher"].close()
        thread.join(timeout=10)


def _post_req(req):
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def test_admin_reload_404_without_token(running_server):
    base, *_ = running_server
    code, _, _ = _post(f"{base}/admin/reload",
                       json.dumps({"artifact": "x"}).encode())
    assert code == 404


def test_reload_engine_drains_old_inflight(monkeypatch, tmp_path):
    """Unit-level drain semantics: requests queued on the OLD engine resolve
    with the OLD engine's results after the swap; post-swap submissions run
    the NEW engine."""
    from satlas_sr_tpu import serve as serve_mod

    old_eng = FakeEngine(batch_size=4)          # y = x + 1
    new_eng = FakeEngine(batch_size=4)

    class Plus2(FakeEngine):
        def fetch(self, handle):
            return handle + 2

    new_eng = Plus2(batch_size=4)
    shape = (32, 32, 6)
    old_mb = MicroBatcher(old_eng, shape, max_wait_ms=5.0, depth=1)
    ctx = {"batcher": old_mb, "opt": {}, "batch_size": None,
           "reload_lock": threading.Lock(), "reloads": 0}

    monkeypatch.setattr(serve_mod, "_build_engine",
                        lambda opt, bs, art, warmup, buckets=None:
                        (new_eng, "fake", shape))

    x = np.zeros(shape, np.uint8)
    old_eng.gate.clear()                         # park the old device "busy"
    pending = [ctx["batcher"].submit(x) for _ in range(3)]

    done = threading.Event()
    result = {}

    def _reload():
        result.update(serve_mod.reload_engine(ctx, "new.ssrx"))
        done.set()

    t = threading.Thread(target=_reload, daemon=True)
    t.start()
    time.sleep(0.2)
    old_eng.gate.set()                           # old engine finishes its work
    assert done.wait(timeout=30)
    for f in pending:                            # old futures: old results
        np.testing.assert_array_equal(f.result(timeout=30),
                                      np.ones(shape, np.uint8))
    assert result["generation"] == 1
    new_fut = ctx["batcher"].submit(x)           # post-swap: new engine
    np.testing.assert_array_equal(new_fut.result(timeout=30),
                                  2 * np.ones(shape, np.uint8))
    ctx["batcher"].close()


# ------------------------------------------------------------------ buckets


class BucketFakeEngine(FakeEngine):
    """FakeEngine accepting bucketed dispatch, recording the chosen shape."""

    def __init__(self, batch_size=8):
        super().__init__(batch_size)
        self.buckets_seen = []

    def round_bucket(self, b):
        return min(self.batch_size, max(1, int(b)))

    def dispatch(self, batch, bucket=None):
        self.gate.wait(timeout=30)
        self.buckets_seen.append(bucket)
        self.batches.append(batch.shape[0])
        return batch


def test_resolve_buckets():
    from satlas_sr_tpu.serve import resolve_buckets

    eng = BucketFakeEngine(batch_size=64)
    assert resolve_buckets(eng, None) == [64]
    assert resolve_buckets(eng, "auto") == [8, 64]
    assert resolve_buckets(eng, [4, 100, 4]) == [4, 64]  # dedup + cap at bs

    class Fixed(BucketFakeEngine):
        # fixed-batch .ssrx artifacts carry exactly one program shape
        def round_bucket(self, b):
            return self.batch_size

    assert resolve_buckets(Fixed(batch_size=16), "auto") == [16]


def test_microbatcher_bucket_selection():
    """A shallow queue dispatches on the small compiled shape; a deep one on
    the full batch — the round-5 low-traffic latency lever."""
    eng = BucketFakeEngine(batch_size=8)
    mb = MicroBatcher(eng, (2, 2, 3), max_wait_ms=5.0, depth=1, buckets=[2])
    x = np.zeros((2, 2, 3), np.uint8)
    try:
        assert mb.buckets == [2, 8]
        mb.submit(x).result(timeout=30)          # lone request -> bucket 2
        eng.gate.clear()                         # hold the device "busy"
        first = mb.submit(x)
        time.sleep(0.1)
        later = [mb.submit(x) for _ in range(5)]
        eng.gate.set()
        for f in [first] + later:
            f.result(timeout=30)
        assert eng.buckets_seen[0] == 2
        # 5 requests coalesced during the stall exceed bucket 2 -> full batch
        assert 8 in eng.buckets_seen
        assert mb.bucket_batches[2] >= 1 and mb.bucket_batches[8] >= 1
    finally:
        mb.close()


def test_pick_bucket_load_aware():
    """The bucket choice must cover the recent load, not just this gather:
    a brief queue dip under sustained saturation stays on the full batch
    (small dispatches at saturation waste in-flight slots — measured ~30%
    p50 cost, BENCH_NOTES round-5 serving buckets), while sustained low
    traffic decays back to the small bucket."""
    eng = BucketFakeEngine(batch_size=64)
    mb = MicroBatcher(eng, (2, 2, 3), max_wait_ms=5.0, depth=1, buckets=[8])
    try:
        assert mb.buckets == [8, 64]
        # cold start: lone request runs the small bucket
        assert mb._pick_bucket(1) == 8
        # sustained full-fill load locks onto the full batch
        for _ in range(10):
            assert mb._pick_bucket(64) == 64
        # a one-gather dip does NOT downshift the program shape
        assert mb._pick_bucket(5) == 64
        assert mb._pick_bucket(64) == 64
        # sustained low traffic decays the EWMA back under the margin
        for _ in range(20):
            mb._pick_bucket(1)
        assert mb._pick_bucket(1) == 8
        # a gather larger than the small bucket always escalates, whatever
        # the EWMA says
        assert mb._pick_bucket(33) == 64
    finally:
        mb.close()


def test_serve_buckets_end_to_end(tmp_path, rng):
    """Real engine, two compiled shapes: a lone request runs the small bucket
    and its HTTP output is identical to the full-batch program's."""
    opt = _serve_opt(tmp_path)
    # the suite's virtual mesh has 8 devices, so the batch quantum is 8:
    # serve batch 16 with an 8-wide small bucket (on a 1-chip production
    # host the quantum is 1 and 'auto' gives batch/8)
    server, batcher = build_server(opt, host="127.0.0.1", port=0,
                                   max_wait_ms=5.0, timeout_s=120.0,
                                   batch_size=16, buckets=[8])
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        assert batcher.buckets == [8, 16]
        s = (rng.rand(4 * 32, 32, 3) * 254 + 1).astype(np.uint8)
        formatted = format_s2naip_data(
            s, N_FRAMES, rng=np.random.RandomState(opt["manual_seed"]))[0]
        expected = batcher.engine.run(formatted[None])[0]
        status, body, _ = _post(base + "/v1/sr", encode_png_bytes(s))
        assert status == 200
        np.testing.assert_array_equal(read_png_bytes(body), expected)
        status, body, _ = _post(base + "/healthz", None, method="GET")
        assert json.loads(body)["buckets"] == [8, 16]
        status, body, _ = _post(base + "/stats", None, method="GET")
        by_bucket = json.loads(body)["batches_by_bucket"]
        assert by_bucket.get("8", 0) >= 1
        status, body, _ = _post(base + "/metrics", None, method="GET")
        assert b'sr_bucket_batches_total{bucket="8"}' in body
    finally:
        server.shutdown()
        server.server_close()
        batcher.close()
        thread.join(timeout=10)
