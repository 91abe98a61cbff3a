"""Microprobes of TPU memory-system behavior behind the epd_flat design.

Measured on v5e through the remote tunnel (2026-08-19). Methodology
matters here: the tunnel adds ~28 ms RTT per fetch and may serve
IDENTICAL-argument dispatches from a cache, so every probe chains the
timed call's inputs off the warmup call's outputs and amortizes over
ITERS=300 in-scan iterations (RTT/300 ~= 0.1 ms floor).

Findings (recorded in BASELINE.md):
  * NO minor-dim padding tax: elementwise on [307008, 64] bf16 runs at
    the same ms as [153504, 128] — XLA does not pay 2x HBM for 64-wide
    tiles. (A naive ITERS=30 probe "showed" 2.3x — tunnel artifact.)
  * Row gathers cost ~3 ns/row REGARDLESS of index locality (sequential
    == random) and of row width (64 == 128 lanes): pure op overhead,
    ~18x off bandwidth for 64-wide bf16 rows. Hence ops/sym_gather.py
    packed_sym_gather: merging same-index gathers into one wide table
    is almost free; and scatter-add measures ~5x a gather.

Usage: python scripts/lane_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ITERS = 300


def scan_time(body, init, iters=ITERS):
    """ms per body() call: ITERS dependency-chained calls per dispatch,
    timed dispatch fed the WARMUP dispatch's output (defeats the
    tunnel's identical-args cache)."""

    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), ()

        out, _ = jax.lax.scan(f, x, None, length=iters)
        return out

    out = run(init)
    float(jnp.sum(out.astype(jnp.float32)[:8, :8]))
    t0 = time.perf_counter()
    out2 = run(out)
    float(jnp.sum(out2.astype(jnp.float32)[:8, :8]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    R, M, H = 307008, 38376, 64
    for shape in [(R, 64), (R // 2, 128), (R // 4, 256)]:
        x = jnp.ones(shape, jnp.bfloat16)
        t = scan_time(lambda c: c * 1.0001 + 0.5, x)
        print(f"elementwise {shape}: {t:7.4f} ms")

    for shape, w in [((R, 64), 64), ((R // 2, 128), 128)]:
        x = jnp.ones(shape, jnp.bfloat16)
        W = jnp.eye(w, dtype=jnp.bfloat16) * 0.999
        t = scan_time(
            lambda c, W=W: jnp.dot(c, W, preferred_element_type=jnp.bfloat16), x
        )
        print(f"matmul      {shape} @ [{w},{w}]: {t:7.4f} ms")

    rng = np.random.default_rng(0)
    x0 = jnp.ones((R, H), jnp.bfloat16)
    t_base = scan_time(lambda c: c * 0.999 + 0.01, x0)
    print(f"ew baseline [R,H]: {t_base:7.4f} ms")
    for name, idx in [
        ("sequential", np.arange(R) % M),
        ("random", rng.integers(0, M, R)),
    ]:
        idxj = jnp.asarray(idx, jnp.int32)
        for w in [64, 128]:
            tbl = jnp.ones((M, w), jnp.bfloat16)

            def body(c, tbl=tbl, idxj=idxj, w=w):
                return (tbl * c[0, 0])[idxj][:, :H] + c * 0.5

            t = scan_time(body, x0)
            print(
                f"gather [{name:10}] from [{M},{w:3}]: {t:7.4f} ms"
                f"  (gather ~= {t - t_base:6.4f})"
            )

    idxj = jnp.asarray(rng.integers(0, M, R), jnp.int32)

    def body_scat(c):
        upd = jnp.zeros((M, H), jnp.bfloat16).at[idxj].add(c * 0.5)
        return c * 0.999 + 0.01 * jnp.broadcast_to(upd[:1], c.shape)

    print(f"scatter-add [R->M]: {scan_time(body_scat, x0):7.4f} ms")


if __name__ == "__main__":
    main()
