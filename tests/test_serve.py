"""Built-in inference server (beyond-parity extra, serve.py): batching
wrapper semantics, input validation, and the real HTTP surface end-to-end
against a live ThreadingHTTPServer — responses must numerically match the
in-process serving functions."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from tests.helpers import tiny_config
from triplegan_tpu.configs.base import make_networks
from triplegan_tpu.export import export_stablehlo, make_serving_fns
from triplegan_tpu.serve import (
    ServingApp,
    app_from_artifacts,
    app_from_state,
    batched_apply,
    make_server,
)
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state

pytestmark = pytest.mark.slow  # multi-minute end-to-end drive


# ---------- batched_apply ----------


def test_batched_apply_chunks_and_pads():
    calls = []

    def fn(a):
        calls.append(np.asarray(a).shape)
        return np.asarray(a) * 2.0

    x = np.arange(10, dtype=np.float32)[:, None]
    out = batched_apply(fn, 4, x)
    np.testing.assert_array_equal(out, x * 2.0)
    # every device call sees the static batch; tail chunk padded 2→4
    assert calls == [(4, 1), (4, 1), (4, 1)]


def test_batched_apply_multi_arg_and_exact_fit():
    def fn(z, y):
        return np.asarray(z) + np.asarray(y)[:, None]

    z = np.ones((8, 3), np.float32)
    y = np.arange(8, dtype=np.float32)
    out = batched_apply(fn, 4, z, y)
    np.testing.assert_array_equal(out, z + y[:, None])


def test_batched_apply_rejects_bad_batches():
    fn = lambda a: a
    with pytest.raises(ValueError, match="empty"):
        batched_apply(fn, 4, np.zeros((0, 2)))
    with pytest.raises(ValueError, match="mismatched"):
        batched_apply(fn, 4, np.zeros((3, 2)), np.zeros((4,)))


# ---------- app validation ----------


def _tiny_app(**kw):
    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    return cfg, state, nets, app_from_state(cfg, nets, state, **kw)


def test_app_validates_inputs():
    cfg, _, _, app = _tiny_app()
    with pytest.raises(ValueError, match="uint8"):
        app.do_classify(np.zeros((2, 16, 16, 3), np.float32))
    with pytest.raises(ValueError, match=r"\[N,H,W,C\]"):
        app.do_classify(np.zeros((16, 16, 3), np.uint8))
    with pytest.raises(ValueError, match="images must be"):
        app.do_classify(np.zeros((2, 8, 8, 3), np.uint8))  # wrong H/W
    with pytest.raises(ValueError, match="z must be"):
        app.do_generate(np.zeros((2, 7), np.float32), np.zeros((2,), np.int32))
    with pytest.raises(ValueError, match="labels"):
        app.do_generate(
            np.zeros((2, cfg.z_dim), np.float32), np.asarray([0, 99], np.int32)
        )
    with pytest.raises(ValueError, match='"n" or a "y"'):
        app.generate_from_json({})


def test_app_requires_at_least_one_fn():
    with pytest.raises(ValueError, match="nothing to serve"):
        ServingApp()


# ---------- live HTTP round-trip ----------


@pytest.fixture(scope="module")
def live_server():
    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    classify, generate = make_serving_fns(cfg, nets, state)
    app = app_from_state(cfg, nets, state, batch_size=4, meta={"source": "test"})
    server = make_server(app, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    yield cfg, classify, generate, app, base
    server.shutdown()
    server.server_close()
    t.join(timeout=10)


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_http_healthz(live_server):
    cfg, _, _, _, base = live_server
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        h = json.loads(r.read().decode())
    assert h["status"] == "ok"
    assert sorted(h["endpoints"]) == ["classify", "generate"]
    assert h["classify_batch"] == 4 and h["z_dim"] == cfg.z_dim
    assert h["image_shape"] == [16, 16, 3]
    assert h["source"] == "test"


def test_http_classify_matches_direct(live_server):
    cfg, classify, _, _, base = live_server
    imgs = np.random.RandomState(0).randint(
        0, 256, size=(7, 16, 16, 3)  # 7: forces chunk (4) + padded tail (3)
    ).astype(np.uint8)
    status, ctype, body = _post(base + "/classify", _npy(imgs), "application/x-npy")
    assert status == 200 and ctype == "application/x-npy"
    got = np.load(io.BytesIO(body))
    want = np.asarray(jax.jit(classify)(imgs[:4]))
    np.testing.assert_allclose(got[:4], want, rtol=1e-5, atol=1e-5)
    assert got.shape == (7, cfg.num_classes) and got.dtype == np.float32


def test_http_generate_json_deterministic_seed(live_server):
    cfg, _, generate, _, base = live_server
    req = json.dumps({"n": 5, "seed": 7}).encode()
    _, _, b1 = _post(base + "/generate", req, "application/json")
    _, _, b2 = _post(base + "/generate", req, "application/json")
    np.testing.assert_array_equal(np.load(io.BytesIO(b1)), np.load(io.BytesIO(b2)))
    imgs = np.load(io.BytesIO(b1))
    assert imgs.shape == (5, 16, 16, 3)
    # default labels cycle classes, z from the seeded RNG — reproduce it
    z = np.random.RandomState(7).normal(size=(5, cfg.z_dim)).astype(np.float32)
    y = (np.arange(5) % cfg.num_classes).astype(np.int32)
    want = np.asarray(jax.jit(generate)(z[:4], y[:4]))
    np.testing.assert_allclose(imgs[:4], want, rtol=1e-5, atol=1e-5)


def test_http_generate_npz_and_pixels(live_server):
    cfg, _, generate, _, base = live_server
    rng = np.random.RandomState(3)
    z = rng.normal(size=(4, cfg.z_dim)).astype(np.float32)
    y = (np.arange(4) % cfg.num_classes).astype(np.int32)
    buf = io.BytesIO()
    np.savez(buf, z=z, y=y)
    status, _, body = _post(base + "/generate", buf.getvalue(), "application/x-npz")
    assert status == 200
    got = np.load(io.BytesIO(body))
    np.testing.assert_allclose(
        got, np.asarray(jax.jit(generate)(z, y)), rtol=1e-5, atol=1e-5
    )
    # JSON pixels=true → uint8
    req = json.dumps({"n": 3, "pixels": True}).encode()
    _, _, body = _post(base + "/generate", req, "application/json")
    assert np.load(io.BytesIO(body)).dtype == np.uint8


def test_http_errors_are_json_and_survivable(live_server):
    *_, app, base = live_server
    # bad dtype → 400 with a JSON error, server keeps serving
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/classify", _npy(np.zeros((2, 16, 16, 3), np.float32)),
              "application/x-npy")
    assert ei.value.code == 400
    assert "uint8" in json.loads(ei.value.read().decode())["error"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/nope", b"{}", "application/json")
    assert ei.value.code == 404
    # still alive
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        assert json.loads(r.read().decode())["status"] == "ok"
    assert app.counters["errors"] >= 1


def test_http_concurrent_requests_serialize_on_device_lock(live_server):
    """Four clients at once: the threaded accept loop + device lock must
    yield four correct, independent responses (no interleaving corruption)."""
    cfg, classify, _, _, base = live_server
    rng = np.random.RandomState(11)
    batches = [
        rng.randint(0, 256, size=(5, 16, 16, 3)).astype(np.uint8) for _ in range(4)
    ]
    results = [None] * 4
    errors = []

    def worker(i):
        try:
            _, _, body = _post(
                base + "/classify", _npy(batches[i]), "application/x-npy"
            )
            results[i] = np.load(io.BytesIO(body))
        except Exception as e:  # surface in the main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    jfn = jax.jit(classify)  # eval-mode classifier: per-sample independent
    for i in range(4):
        want = np.asarray(jfn(batches[i]))
        np.testing.assert_allclose(results[i], want, rtol=1e-5, atol=1e-5)


def test_npz_posted_to_classify_is_a_400(live_server):
    *_, base = live_server
    buf = io.BytesIO()
    np.savez(buf, z=np.zeros((2, 2)))
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/classify", buf.getvalue(), "application/x-npy")
    assert ei.value.code == 400
    assert "single .npy array" in json.loads(ei.value.read().decode())["error"]


def test_http_keepalive_survives_404_with_body(live_server):
    """Review regression: a POST to an unknown route must drain its body —
    otherwise the unread bytes are parsed as the next request line on the
    keep-alive connection (observed: '501 Unsupported method')."""
    import socket

    *_, base = live_server
    host, port = base.rsplit("//", 1)[1].split(":")
    with socket.create_connection((host, int(port)), timeout=60) as s:
        body = b"X" * 10
        req = (
            f"POST /nope HTTP/1.1\r\nHost: {host}\r\n"
            f"Content-Length: {len(body)}\r\nContent-Type: application/json\r\n\r\n"
        ).encode() + body
        # pipeline a second request on the same connection
        req += f"GET /healthz HTTP/1.1\r\nHost: {host}\r\n\r\n".encode()
        s.sendall(req)
        s.settimeout(60)
        data = b""
        while b'"status": "ok"' not in data:
            chunk = s.recv(65536)
            if not chunk:
                break
            data = data + chunk
    assert data.startswith(b"HTTP/1.1 404")
    assert b"501" not in data and b"Unsupported method" not in data
    assert b'"status": "ok"' in data  # the pipelined healthz got served


def test_http_oversize_content_length_rejected_without_buffering(live_server):
    """Review regression: a hostile Content-Length must 400 BEFORE the
    server tries to buffer it (no multi-GB rfile.read)."""
    import socket

    from triplegan_tpu.serve import MAX_BODY_BYTES

    *_, base = live_server
    host, port = base.rsplit("//", 1)[1].split(":")
    for bad in (str(MAX_BODY_BYTES + 1), "-1", "zzz"):
        with socket.create_connection((host, int(port)), timeout=60) as s:
            s.sendall(
                (
                    f"POST /classify HTTP/1.1\r\nHost: {host}\r\n"
                    f"Content-Length: {bad}\r\n\r\n"
                ).encode()
            )
            s.settimeout(60)
            data = s.recv(65536)
        assert data.startswith(b"HTTP/1.1 400"), (bad, data[:80])


def test_generate_json_needs_labels_when_num_classes_unknown():
    """Review regression: an artifact-served generator (num_classes
    unknown) must refuse label-free JSON generates instead of silently
    cycling 10 classes that may not exist."""
    app = ServingApp(
        generate=lambda z, y: np.zeros((z.shape[0], 4, 4, 1), np.float32),
        generate_batch=4,
        z_dim=8,
        num_classes=0,
    )
    with pytest.raises(ValueError, match="num_classes"):
        app.generate_from_json({"n": 4})
    out = app.generate_from_json({"n": 4, "y": [0, 1, 2, 3]})  # explicit y ok
    assert out.shape == (4, 4, 4, 1)


def test_app_from_artifacts_rejects_wrong_artifact_kind(tmp_path):
    """Review regression: a generator artifact passed as --classifier (or
    vice versa) must fail with a clear message, not a tuple-unpack crash."""
    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    classify, generate = make_serving_fns(cfg, nets, state)
    img_spec = jax.ShapeDtypeStruct((4, 16, 16, 3), np.uint8)
    z_spec = jax.ShapeDtypeStruct((4, cfg.z_dim), np.float32)
    y_spec = jax.ShapeDtypeStruct((4,), np.int32)
    cpath = export_stablehlo(classify, (img_spec,), str(tmp_path / "c.stablehlo"))
    gpath = export_stablehlo(generate, (z_spec, y_spec), str(tmp_path / "g.stablehlo"))
    with pytest.raises(ValueError, match="not a classifier artifact"):
        app_from_artifacts(classifier_path=gpath)
    with pytest.raises(ValueError, match="not a generator artifact"):
        app_from_artifacts(generator_path=cpath)


def test_cli_serve_rejects_both_sources(tmp_path):
    from triplegan_tpu.cli import main

    with pytest.raises(SystemExit, match="ONE source"):
        main(["serve", "--config", "mnist100", "--workdir", str(tmp_path),
              "--classifier", str(tmp_path / "c.stablehlo")])


# ---------- serving exported .stablehlo artifacts ----------


def test_app_from_artifacts_matches_state_serving(tmp_path):
    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    classify, generate = make_serving_fns(cfg, nets, state)
    img_spec = jax.ShapeDtypeStruct((4, 16, 16, 3), np.uint8)
    z_spec = jax.ShapeDtypeStruct((4, cfg.z_dim), np.float32)
    y_spec = jax.ShapeDtypeStruct((4,), np.int32)
    cpath = export_stablehlo(classify, (img_spec,), str(tmp_path / "c.stablehlo"))
    gpath = export_stablehlo(generate, (z_spec, y_spec), str(tmp_path / "g.stablehlo"))

    app = app_from_artifacts(classifier_path=cpath, generator_path=gpath)
    # shapes recovered from the artifacts' in_avals, no config involved
    assert app.classify_batch == 4 and app.generate_batch == 4
    assert app.image_shape == (16, 16, 3) and app.z_dim == cfg.z_dim

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(6, 16, 16, 3)).astype(np.uint8)
    got = app.do_classify(imgs)
    want4 = np.asarray(jax.jit(classify)(imgs[:4]))
    np.testing.assert_allclose(got[:4], want4, rtol=1e-5, atol=1e-5)

    z = rng.normal(size=(4, cfg.z_dim)).astype(np.float32)
    y = (np.arange(4) % cfg.num_classes).astype(np.int32)
    np.testing.assert_allclose(
        app.do_generate(z, y), np.asarray(jax.jit(generate)(z, y)),
        rtol=1e-5, atol=1e-5,
    )


def test_cli_serve_requires_a_source():
    from triplegan_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["serve", "--port", "0"])


def test_app_from_state_quantized_close_to_f32():
    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    app = app_from_state(cfg, nets, state, batch_size=4)
    qapp = app_from_state(cfg, nets, state, batch_size=4, quantize="int8")
    imgs = np.random.RandomState(5).randint(
        0, 256, size=(4, 16, 16, 3)
    ).astype(np.uint8)
    a, q = app.do_classify(imgs), qapp.do_classify(imgs)
    # fresh-init logits are near-tied, so argmax may flip between ~equal
    # classes; the contract is the small weight-space drift bound
    assert np.max(np.abs(a - q)) < 0.05


def test_reload_swaps_fns_and_step():
    """POST /reload semantics at the app level: fns swap atomically under
    the device lock, step updates, artifact apps refuse."""
    calls = {"n": 0}

    def reloader():
        calls["n"] += 1
        return {
            "classify": lambda imgs: np.full((imgs.shape[0], 3), calls["n"], np.float32),
            "step": 100 * calls["n"],
        }

    app = ServingApp(
        classify=lambda imgs: np.zeros((imgs.shape[0], 3), np.float32),
        classify_batch=4,
        image_shape=(8, 8, 1),
        reloader=reloader,
    )
    imgs = np.zeros((4, 8, 8, 1), np.uint8)
    assert app.do_classify(imgs)[0, 0] == 0.0
    out = app.do_reload()
    assert out == {"reloaded": True, "step": 100}
    assert app.do_classify(imgs)[0, 0] == 1.0
    assert app.counters["reload"] == 1

    no_reload = ServingApp(classify=lambda x: x, classify_batch=4)
    with pytest.raises(ValueError, match="no reload source"):
        no_reload.do_reload()


def test_http_reload_serves_newer_checkpoint(tmp_path):
    """End-to-end: save a newer checkpoint while the server runs, POST
    /reload, and the served logits become the new checkpoint's."""
    import urllib.request

    from triplegan_tpu.ckpt import CheckpointManager
    from triplegan_tpu.serve import make_checkpoint_reloader

    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1)).replace(step=1)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    mgr.wait()

    ro = CheckpointManager(str(tmp_path / "ckpt"), write=False)
    first = ro.restore(state)
    app = app_from_state(
        cfg, nets, first, batch_size=4, meta={"step": int(first.step)},
        reloader=make_checkpoint_reloader(cfg, nets, ro, state),
    )
    server = make_server(app, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        imgs = np.random.RandomState(0).randint(
            0, 256, size=(4, 16, 16, 3)
        ).astype(np.uint8)
        _, _, body = _post(base + "/classify", _npy(imgs), "application/x-npy")
        before = np.load(io.BytesIO(body))

        # a "training run" writes a newer checkpoint with shifted params
        import jax

        bumped = state.replace(
            params=jax.tree.map(lambda a: a + 0.05, state.params), step=2
        )
        mgr.save(2, bumped)
        mgr.wait()

        _, _, body = _post(base + "/reload", b"", "application/json")
        assert json.loads(body) == {"reloaded": True, "step": 2}
        _, _, body = _post(base + "/classify", _npy(imgs), "application/x-npy")
        after = np.load(io.BytesIO(body))
        assert np.abs(after - before).max() > 1e-4  # genuinely new weights
        h = json.loads(urllib.request.urlopen(base + "/healthz", timeout=60).read())
        assert h["step"] == 2 and "reload" in h["endpoints"]
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_http_metrics_prometheus_format(live_server):
    import urllib.request

    *_, base = live_server
    # bump a counter first
    imgs = np.zeros((4, 16, 16, 3), np.uint8)
    _post(base + "/classify", _npy(imgs), "application/x-npy")
    with urllib.request.urlopen(base + "/metrics", timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert "# TYPE triplegan_requests_total counter" in text
    assert 'triplegan_requests_total{endpoint="classify"}' in text
    assert 'triplegan_serving_batch{fn="classify"} 4' in text
    # counter values parse as integers and classify >= 1
    for line in text.splitlines():
        if line.startswith('triplegan_requests_total{endpoint="classify"}'):
            assert int(line.rsplit(" ", 1)[1]) >= 1
    # cumulative latency counter present and positive after a request
    assert "# TYPE triplegan_request_seconds_total counter" in text
    for line in text.splitlines():
        if line.startswith('triplegan_request_seconds_total{endpoint="classify"}'):
            assert float(line.rsplit(" ", 1)[1]) > 0.0


def test_http_fuzz_garbage_never_kills_the_server(live_server):
    """50 random-garbage requests (random bodies, routes, content types)
    must each produce an orderly HTTP error — and the server must still
    serve real traffic afterwards."""
    import urllib.request

    *_, base = live_server
    rng = np.random.RandomState(0)
    routes = ["/classify", "/generate", "/reload", "/weird", "/"]
    ctypes = ["application/x-npy", "application/json", "text/plain", ""]
    for i in range(50):
        body = bytes(rng.randint(0, 256, size=rng.randint(0, 200), dtype=np.uint8))
        req = urllib.request.Request(
            base + routes[i % len(routes)],
            data=body,
            headers={"Content-Type": ctypes[i % len(ctypes)]},
        )
        try:
            urllib.request.urlopen(req, timeout=60).read()
        except urllib.error.HTTPError as e:
            assert e.code in (400, 404, 500)
            json.loads(e.read().decode())  # error body is always JSON
    # still alive and numerically correct
    imgs = np.random.RandomState(1).randint(
        0, 256, size=(4, 16, 16, 3)
    ).astype(np.uint8)
    _, _, body = _post(base + "/classify", _npy(imgs), "application/x-npy")
    assert np.isfinite(np.load(io.BytesIO(body))).all()


def test_cli_serve_sigterm_graceful(tmp_path):
    """Container orchestrators stop pods with SIGTERM: the CLI server must
    stop accepting, release the socket, and exit 0 — not die mid-request
    with a failure status."""
    import os
    import signal
    import subprocess
    import sys
    import time

    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    classify, _ = make_serving_fns(cfg, nets, state)
    img_spec = jax.ShapeDtypeStruct((4, 16, 16, 3), np.uint8)
    cpath = export_stablehlo(classify, (img_spec,), str(tmp_path / "c.stablehlo"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, TRIPLEGAN_PLATFORM="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [sys.executable, "-m", "triplegan_tpu.cli", "serve",
         "--classifier", cpath, "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        deadline = time.time() + 300
        port = None
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving on http://" in line:
                port = int(line.split("http://", 1)[1].split()[0].rsplit(":", 1)[1])
                break
        assert port, "server never announced its port"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60
        ) as r:
            assert json.loads(r.read())["status"] == "ok"
        proc.send_signal(signal.SIGTERM)
        out_rest = proc.stdout.read()
        rc = proc.wait(timeout=120)
        assert rc == 0, f"exit {rc}: {out_rest}"
        assert "shutting down" in out_rest
    finally:
        if proc.poll() is None:
            proc.kill()
