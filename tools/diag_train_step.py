"""Diagnose AdaCoF train-step throughput on the axon TPU: separates device
compute (resident batch) from host->device transfer (fresh f32 / fresh u8 with
on-device normalize) and from the host augmentation pipeline."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fmvfi_tpu.train import trainer as T

H = W = 256
B = 8
rng = jax.random.key(0)
state, step = T.make_adacof_trainer(rng, H, W, kernel_size=5, dilation=1)
jstep = jax.jit(step, donate_argnums=0)

r = np.random.default_rng(0)
host = [r.uniform(0, 1, (B, H, W, 3)).astype(np.float32) for _ in range(3)]
host_u8 = [(h * 255).astype(np.uint8) for h in host]
dev = tuple(jnp.asarray(h) for h in host)


def sync(s):
    return float(jnp.sum(jax.tree.leaves(s.params)[0]))


# warmup/compile
state, m = jstep(state, dev)
print("compiled; warm loss", float(m["loss"]), flush=True)

N = 30
t0 = time.time()
for _ in range(N):
    state, m = jstep(state, dev)
_ = sync(state)
t_resident = (time.time() - t0) / N
print(f"resident-batch step: {t_resident*1e3:.1f} ms", flush=True)

t0 = time.time()
for _ in range(N):
    batch = tuple(jnp.asarray(h) for h in host)
    state, m = jstep(state, batch)
_ = sync(state)
t_f32 = (time.time() - t0) / N
print(f"fresh-f32-transfer step: {t_f32*1e3:.1f} ms", flush=True)

jstep_u8 = jax.jit(
    lambda s, b: step(s, tuple(x.astype(jnp.float32) / 255.0 for x in b)),
    donate_argnums=0,
)
state, m = jstep_u8(state, tuple(jnp.asarray(h) for h in host_u8))
t0 = time.time()
for _ in range(N):
    batch = tuple(jnp.asarray(h) for h in host_u8)
    state, m = jstep_u8(state, batch)
_ = sync(state)
t_u8 = (time.time() - t0) / N
print(f"fresh-u8-transfer step: {t_u8*1e3:.1f} ms", flush=True)

# host pipeline rate (no device)
from fmvfi_tpu.train.data import MixedSynthStream, batch_iterator

cache = "runs/demo_stack/pool_768.npy"
if os.path.exists(cache):
    ds = MixedSynthStream.__new__(MixedSynthStream)
    ds._items = list(np.load(cache))
    it = batch_iterator(ds, B, crop=H, seed=3)
    next(it)
    t0 = time.time()
    for _ in range(N):
        next(it)
    t_data = (time.time() - t0) / N
    print(f"host augmentation batch: {t_data*1e3:.1f} ms", flush=True)
