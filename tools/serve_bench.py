"""Measure serving-side inference throughput of the exported fns on the real chip (see docs/DEPLOY.md §4)."""
import os
import sys
import time

import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from triplegan_tpu.configs import get_config
from triplegan_tpu.configs.base import apply_runtime, make_networks
from triplegan_tpu.export import make_serving_fns
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state

cfg = get_config("cifar10_4k")
cfg.compute_dtype = "bfloat16"
apply_runtime(cfg)
nets = make_networks(cfg)
state = create_state(cfg, nets, make_optimizers(cfg, 1))
classify, generate = make_serving_fns(cfg, nets, state)
cl = jax.jit(classify)
gen = jax.jit(generate)

for b in (256, 512, 1024):
    imgs = jnp.asarray(np.random.RandomState(0).randint(0, 256, size=(b, 32, 32, 3)), jnp.uint8)
    out = cl(imgs); float(out[0, 0])  # compile + fence
    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = cl(imgs)
    float(out[0, 0])  # hard fence: real device->host scalar
    dt = time.perf_counter() - t0
    print(f"classify b={b}: {b*n_iter/dt:,.0f} img/s  ({1e3*dt/n_iter:.3f} ms/batch)")

b = 512
z = jnp.asarray(np.random.RandomState(1).normal(size=(b, cfg.z_dim)), jnp.float32)
y = jnp.asarray(np.arange(b) % 10, jnp.int32)
x = gen(z, y); float(x[0, 0, 0, 0])
t0 = time.perf_counter()
for _ in range(30):
    x = gen(z, y)
float(x[0, 0, 0, 0])
dt = time.perf_counter() - t0
print(f"generate b={b}: {b*30/dt:,.0f} img/s  ({1e3*dt/30:.3f} ms/batch)")
