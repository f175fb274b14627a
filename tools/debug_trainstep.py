"""Repro at train-step level: warm-start from the clean step-12k AdaCoF
checkpoint, run a few real train steps on TPU, compare loss/params vs CPU."""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

import fmvfi_tpu.train.trainer as T
from fmvfi_tpu.utils.convert import load_adacof_weights

print("backend:", jax.default_backend(), flush=True)
rng = jax.random.PRNGKey(0)
crop = 256

state, step = T.make_adacof_trainer(
    rng, crop, crop, kernel_size=5, dilation=1, lr=1e-3, lr_decay_steps=20000
)
init = load_adacof_weights("/root/repo/runs/demo_stack/adacof_step12k_maybe.msgpack")
state = state._replace(params=init["params"])

jstep = jax.jit(
    lambda s, b: step(s, tuple(x.astype(jnp.float32) / 255.0 for x in b)),
)

# same batch construction as train_demo_stack (pool, seed 7)
pool = np.load("/root/repo/runs/demo_stack/pool_768.npy", mmap_mode="r")
rngn = np.random.default_rng(7)


def make_batch(batch=8):
    f1s, mids, f2s = [], [], []
    for _ in range(batch):
        v = pool[int(rngn.integers(0, len(pool)))]
        H, W = v.shape[1:3]
        y = int(rngn.integers(0, H - crop + 1))
        x = int(rngn.integers(0, W - crop + 1))
        tri = np.array(v[:, y : y + crop, x : x + crop])
        f1s.append(tri[0]); mids.append(tri[1]); f2s.append(tri[2])
    return (np.stack(f1s), np.stack(mids), np.stack(f2s))


def pnorm(p):
    return float(
        jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x)), p, 0.0
        ) ** 0.5
    )


print("init param norm", pnorm(state.params), flush=True)
batches = [make_batch() for _ in range(5)]
s = state
for i, b in enumerate(batches):
    bt = tuple(jnp.asarray(x) for x in b)
    s, metrics = jstep(s, bt)
    m = {k: float(v) for k, v in metrics.items()}
    print(f"step {i}: {m}  pnorm {pnorm(s.params):.4f}", flush=True)
print("done", flush=True)
