"""Microprobe: weight-grad dot formulations for edge-sized operands.

The r3 headline profile attributes ~1.5 ms/step to 10 bf16[307k,64]
{0,1}<->{1,0} relayout copies in the edge block — XLA's layout
assignment for the AD weight-grad dots d_w = x^T @ g (contracting the
307k edge dim) conflicts with the forward dots' layout of the same
activations. This probe measures candidate formulations IN A CONTEXT
where x feeds both a forward dot and the weight-grad contraction (an
isolated d_w dot lets XLA pick the operand layout freely and hides the
copy).

Forms:
  plain    d_w = dot_general(x, g, ((0,),(0,)))             (AD's form)
  batched  view x,g as [G, Kb, H]; batched dot over G contracting Kb,
           then sum the G partial products (layout-friendly per-batch
           matmuls; needs E % Kb == 0)
  swapped  d_w^T = dot_general(g, x, ((0,),(0,)))

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/wgrad_probe.py

RESULTS (v5e, 2026-08-21, bf16 [307200, 64] operands, 20-iter chained
loops incl ~1.4 ms tunnel amortization):

  plain(bf16 out):  75.51 ms   <- AD's exact form, ISOLATED: pathological
   plain(f32 out):   2.07 ms
   batched kb=512:   2.74 ms
  batched kb=2048:   2.99 ms
          swapped:   2.92 ms

In the FULL train step the bf16-out pathology does not reproduce — XLA
rewrites it there, and pinning d_w to the f32 form via a custom VJP
(models/epd_flat._dot_wf32) measured wall-neutral (25.82 vs 25.88 ms
control). _dot_wf32 is kept for the numerics (f32 weight grads instead
of bf16-rounded), not for time. Another datapoint for the rule that
isolated gather/dot probes on this stack must be confirmed in context.
"""

import os
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

E = 307_200  # = 600 * 512; stand-in for the headline's 307,008 edge rows
H = 64
ITERS = 20
DT = jnp.bfloat16


def run(fn, x, g, w):
    f = jax.jit(fn)
    out = f(x, g, w)
    float(jnp.sum(out[1]))  # sync (tunnel-safe fence)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        # dependency-chain via x so iterations serialize
        x = x + out[0][:, :1] * 0
        out = f(x, g, w)
    float(jnp.sum(out[1]))
    return (time.perf_counter() - t0) / ITERS * 1e3


def plain(x, g, w):
    y = jnp.dot(x, w, preferred_element_type=DT)
    dw = jax.lax.dot_general(x, g, (((0,), (0,)), ((), ())), preferred_element_type=DT)
    return y, dw


def plain_f32(x, g, w):
    y = jnp.dot(x, w, preferred_element_type=DT)
    dw = jax.lax.dot_general(x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return y, dw


def batched(x, g, w, kb=512):
    y = jnp.dot(x, w, preferred_element_type=DT)
    gct = E // kb
    x3 = x.reshape(gct, kb, H)
    g3 = g.reshape(gct, kb, H)
    part = jax.lax.dot_general(
        x3, g3, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, H, H]
    dw = jnp.sum(part, axis=0)
    return y, dw


def swapped(x, g, w):
    y = jnp.dot(x, w, preferred_element_type=DT)
    dwt = jax.lax.dot_general(g, x, (((0,), (0,)), ((), ())), preferred_element_type=DT)
    return y, dwt.T


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(E, H)), DT)
    g = jnp.asarray(rng.normal(size=(E, H)), DT)
    w = jnp.asarray(rng.normal(size=(H, H)), DT)
    for name, fn in [
        ("plain(bf16 out)", plain),
        ("plain(f32 out)", plain_f32),
        ("batched kb=512", batched),
        ("batched kb=2048", lambda x, g, w: batched(x, g, w, 2048)),
        ("swapped", swapped),
    ]:
        ms = run(fn, x, g, w)
        print(f"{name:>18}: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
