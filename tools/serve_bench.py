"""Measure serving-side inference throughput of the exported fns on the
real chip (see docs/DEPLOY.md §4).

cifar10_4k is a zca config, so the REAL exported classifier bakes in the
3072×3072 whitening matmul — this bench fits ZCA stats (on random pixels;
same compute as real stats) and measures that program. A no-zca variant is
also reported so the whitening cost is visible.
"""
import os
import sys
import time

import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from triplegan_tpu.configs import get_config
from triplegan_tpu.configs.base import apply_runtime, make_networks
from triplegan_tpu.data.zca import fit_zca
from triplegan_tpu.export import make_serving_fns
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state

cfg = get_config("cifar10_4k")
cfg.compute_dtype = "bfloat16"
apply_runtime(cfg)
nets = make_networks(cfg)
state = create_state(cfg, nets, make_optimizers(cfg, 1))
rng = np.random.RandomState(0)
zca = fit_zca(rng.randint(0, 256, size=(4096, 32, 32, 3)).astype(np.uint8))

for label, stats, quant in (
    ("zca-baked (the real cifar artifact)", zca, None),
    ("zca-baked int8 weight-only", zca, "int8"),
    ("no-zca", None, None),
):
    classify, generate = make_serving_fns(
        cfg, nets, state, zca_stats=stats, quantize=quant
    )
    cl = jax.jit(classify)
    print(f"-- classify, {label} --")
    for b in [int(x) for x in os.environ.get("SERVE_BENCH_BATCHES", "256,512,1024").split(",")]:
        imgs = jnp.asarray(rng.randint(0, 256, size=(b, 32, 32, 3)), jnp.uint8)
        out = cl(imgs); float(out[0, 0])  # compile + fence
        n_iter = int(os.environ.get("SERVE_BENCH_ITERS", "50"))
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = cl(imgs)
        float(out[0, 0])  # hard fence: real device->host scalar
        dt = time.perf_counter() - t0
        print(f"classify b={b}: {b*n_iter/dt:,.0f} img/s  ({1e3*dt/n_iter:.3f} ms/batch)")

_, generate = make_serving_fns(cfg, nets, state)
gen = jax.jit(generate)
b = 512
z = jnp.asarray(rng.normal(size=(b, cfg.z_dim)), jnp.float32)
y = jnp.asarray(np.arange(b) % 10, jnp.int32)
x = gen(z, y); float(x[0, 0, 0, 0])
t0 = time.perf_counter()
for _ in range(30):
    x = gen(z, y)
float(x[0, 0, 0, 0])
dt = time.perf_counter() - t0
print(f"generate b={b}: {b*30/dt:,.0f} img/s  ({1e3*dt/30:.3f} ms/batch)")

# --http: the same classify program through the built-in HTTP server
# (serve.py) — measures the end-to-end serving overhead (npy
# serialization + HTTP + chunk/pad) on top of the raw device call.
if "--http" in sys.argv:
    import io
    import json
    import threading
    import urllib.request

    from triplegan_tpu.serve import app_from_state, make_server

    for bsz in [int(x) for x in os.environ.get("SERVE_BENCH_HTTP_BATCHES", "256,512").split(",")]:
        app = app_from_state(cfg, nets, state, zca_stats=zca, batch_size=bsz)
        server = make_server(app, port=0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = "http://127.0.0.1:%d/classify" % server.server_address[1]
        imgs = rng.randint(0, 256, size=(bsz, 32, 32, 3)).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, imgs)
        body = buf.getvalue()

        def call():
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/x-npy"}
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return np.load(io.BytesIO(r.read()))

        call()  # compile + warm
        n_iter = int(os.environ.get("SERVE_BENCH_ITERS", "50"))
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = call()
        dt = time.perf_counter() - t0  # response body IS host-side: no fence needed
        print(
            f"classify-over-HTTP b={bsz} (zca-baked): {bsz*n_iter/dt:,.0f} img/s  "
            f"({1e3*dt/n_iter:.3f} ms/req incl. serialization)"
        )
        server.shutdown()
        server.server_close()  # release the listening socket
        t.join(timeout=10)
