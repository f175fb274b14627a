"""Repro: does the Pallas AdaCoF backward corrupt at large offsets?

Compares adacof_warp_pallas_bwd (TPU) against jnp-autodiff gradients
(computed on CPU) for controlled offset magnitudes.
"""
import os, sys, time
import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from fmvfi_tpu.ops.adacof import adacof_warp as warp_jnp
from fmvfi_tpu.ops.adacof_pallas import adacof_warp_pallas, adacof_warp_pallas_bwd

cpu = jax.devices("cpu")[0]
try:
    tpu = jax.devices()[0]
    on_tpu = tpu.platform != "cpu"
except Exception:
    on_tpu = False
print("backend:", jax.default_backend(), "on_tpu:", on_tpu, flush=True)

B, H, W, C, F, d = 2, 256, 256, 3, 5, 1
H_in = H + (F - 1) * d
rng = np.random.default_rng(0)

x = rng.random((B, H_in, H_in, C), np.float32)
w = rng.random((B, H, W, F * F), np.float32)
w /= w.sum(-1, keepdims=True)
g = rng.random((B, H, W, C), np.float32)

for mag in [2.0, 10.0, 25.0]:
    ai = (rng.random((B, H, W, F * F), np.float32) * 2 - 1) * mag
    bj = (rng.random((B, H, W, F * F), np.float32) * 2 - 1) * mag

    # ----- reference grads on CPU via autodiff
    with jax.default_device(cpu):
        xj, wj, aij, bjj, gj = (jnp.asarray(t) for t in (x, w, ai, bj, g))
        out_ref, vjp = jax.vjp(
            lambda ww, aa, bb: warp_jnp(xj, ww, aa, bb, d), wj, aij, bjj
        )
        dw_r, da_r, db_r = vjp(gj)
        dw_r, da_r, db_r, out_ref = map(np.asarray, (dw_r, da_r, db_r, out_ref))

    # ----- pallas on default backend
    t0 = time.time()
    out_p = np.asarray(adacof_warp_pallas(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(ai), jnp.asarray(bj), d))
    dw_p, da_p, db_p = adacof_warp_pallas_bwd(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(ai), jnp.asarray(bj),
        jnp.asarray(g), d)
    dw_p, da_p, db_p = map(np.asarray, (dw_p, da_p, db_p))
    dt = time.time() - t0

    def err(a, b):
        e = np.abs(a - b)
        rel = e.max() / (np.abs(b).max() + 1e-8)
        return f"max {e.max():.3e} rel {rel:.3e} frac>1e-3 {np.mean(e > 1e-3):.4f}"

    print(f"--- mag {mag} ({dt:.1f}s)")
    print("  fwd:", err(out_p, out_ref))
    print("  dw :", err(dw_p, dw_r))
    print("  da :", err(da_p, da_r))
    print("  db :", err(db_p, db_r))
    for name, p, r in (("dw", dw_p, dw_r), ("da", da_p, da_r), ("db", db_p, db_r)):
        e = np.abs(p - r)
        if e.max() > 1e-2 * (np.abs(r).max() + 1e-8):
            # locate worst error
            idx = np.unravel_index(e.argmax(), e.shape)
            print(f"    {name} worst at {idx}: pallas {p[idx]:.5f} ref {r[idx]:.5f}"
                  f"  offset ai {ai[idx]:.3f} bj {bj[idx]:.3f}")
            # error by row within tile
            rows = e.max(axis=(0, 2, 3))
            bad = np.where(rows > 1e-3)[0]
            print(f"    {name} bad rows ({len(bad)}): {bad[:20]} ...")
print("done", flush=True)
