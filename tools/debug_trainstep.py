"""Repro at train-step level: warm-start from the clean step-12k AdaCoF
checkpoint, run a few real train steps on TPU, compare loss/params vs CPU."""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

import fmvfi_tpu.train.trainer as T
from fmvfi_tpu.utils.convert import load_adacof_weights

import argparse

ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=5)
ap.add_argument("--donate", action="store_true")
ap.add_argument("--lr", type=float, default=5e-4)
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--save_state", type=int, default=0,
                help="save params to /tmp/dbg_state_<N>.msgpack after step N")
args = ap.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

print("backend:", jax.default_backend(), "donate:", args.donate, flush=True)
rng = jax.random.PRNGKey(0)
crop = 256

state, step = T.make_adacof_trainer(
    rng, crop, crop, kernel_size=5, dilation=1, lr=args.lr, lr_decay_steps=10000
)
init = load_adacof_weights("/root/repo/runs/demo_stack/adacof_step12k_maybe.msgpack")
state = state._replace(params=init["params"])

jstep = jax.jit(
    lambda s, b: step(s, tuple(x.astype(jnp.float32) / 255.0 for x in b)),
    **({"donate_argnums": 0} if args.donate else {}),
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
s = state
first_bad = -1
losses = []
b0 = None
for i in range(args.steps):
    b = make_batch()
    bt = tuple(jnp.asarray(x) for x in b)
    if b0 is None:
        b0 = bt
    prev = s
    s, metrics = jstep(s, bt)
    lv = float(metrics["loss"])
    losses.append(lv)
    if i < 5 or (i + 1) % 20 == 0 or not np.isfinite(lv) or lv > 1.0:
        m = {k: f"{float(v):.3e}" for k, v in metrics.items()}
        print(f"step {i}: {m}", flush=True)
    if args.save_state and i == args.save_state:
        from fmvfi_tpu.utils.checkpoint import save_msgpack
        save_msgpack(f"/tmp/dbg_state_{i}.msgpack", {"params": s.params})
        np.savez(f"/tmp/dbg_batch_{i}.npz", f1=b[0], mid=b[1], f2=b[2])
        print(f"saved state+batch at step {i}", flush=True)
    if not np.isfinite(lv) and first_bad < 0:
        first_bad = i
        print(f"FIRST NON-FINITE at step {i}; pnorm(new) {pnorm(s.params):.4f}",
              flush=True)
        print("last 10 losses:", [f"{x:.4f}" for x in losses[-10:]], flush=True)
        np.savez("/tmp/bad_batch.npz", f1=b[0], mid=b[1], f2=b[2])
        if args.donate:
            break  # prev state was donated — can't re-evaluate
        # discriminator: same batch, same (frozen) params, fresh call.
        # finite now  => transient device-side glitch (state NOT the cause)
        # inf again   => params genuinely reached an exploding point
        for trial in range(3):
            _, m2 = jstep(prev, bt)
            print(f"  re-eval trial {trial}: loss {float(m2['loss']):.5f}",
                  flush=True)
        # control: step-0 state + step-0 batch gave a finite loss at process
        # start; if it is inf NOW, the device/process state is corrupted
        _, m0 = jstep(state, b0)
        print(f"  control (state0, batch0): loss {float(m0['loss']):.5f} "
              f"(was {losses[0]:.5f} at start)", flush=True)
        break
print("done; first_bad =", first_bad, flush=True)
