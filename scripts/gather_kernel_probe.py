"""Prototype: can a Pallas kernel beat XLA's row-gather on TPU?

XLA's gather of 307k rows from a [38k, 64] table costs ~0.92 ms on
v5e regardless of index locality or row width — pure op overhead, not
bandwidth (the data is 39 MB ~= 0.05 ms). The table fits in VMEM
(4.9 MB), so a kernel that keeps it resident and loops dynamic-slice
row reads might pipeline faster.

RESULT (v5e, 2026-08-19): NEGATIVE — keep XLA's gather.
  * f32 per-row fori_loop variants compile but run ~3.8 ms (4x slower
    than XLA): Mosaic emits ~12 ns/row for dynamic single-sublane
    loads/stores, no software pipelining across iterations.
  * every bf16 variant fails to compile (single-row dynamic stores hit
    the (2,1) sublane packing; Mosaic internal error).
  * jnp.take inside a kernel: no gather lowering ("Can only load
    scalars from SMEM").
The winning lever was the opposite direction: keep XLA's gather but
merge same-index gathers into one wide-row gather (gather cost is
per-row, width-free) — see ops/sym_gather.py packed_sym_gather.

Variants:
  xla      — tbl[idx] baseline
  loop     — fori_loop, one row per iteration
  unroll8  — 8 rows per iteration, single stacked store
  take     — jnp.take inside the kernel (if Mosaic supports gather)

Usage: python scripts/gather_kernel_probe.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_PAD = 38384  # 38376 rounded up to 8 sublanes
E = 307008
H = 64
TILE = 1024
ITERS = 300


def _gather_loop_kernel(idx_ref, tbl_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = tbl_ref[idx_ref[i, 0], :]
        return 0

    jax.lax.fori_loop(0, TILE, body, 0)


def _gather_unroll8_kernel(idx_ref, tbl_ref, out_ref):
    def body(i, _):
        base = i * 8
        rows = [tbl_ref[idx_ref[base + j, 0], :][None, :] for j in range(8)]
        out_ref[pl.ds(base, 8), :] = jnp.concatenate(rows, axis=0)
        return 0

    jax.lax.fori_loop(0, TILE // 8, body, 0)


def _gather_take_kernel(idx_ref, tbl_ref, out_ref):
    out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:, 0], axis=0)


def make_pallas_gather(kernel, tile=TILE):
    grid = E // tile

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((M_PAD, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, H), tbl.dtype),
        )(idx, tbl)

    return run


def scan_time(body, init, iters=ITERS):
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
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 38376, (E, 1)), jnp.int32)
    tbl = jnp.asarray(rng.normal(size=(M_PAD, H)), jnp.bfloat16)
    x0 = jnp.ones((E, H), jnp.bfloat16)

    def body_xla(c):
        return (tbl * c[0, 0])[idx[:, 0]] + c * 0.5

    print(f"xla gather:     {scan_time(body_xla, x0):7.4f} ms")

    ref = (tbl)[idx[:, 0]]
    for name, kernel in [
        ("loop", _gather_loop_kernel),
        ("unroll8", _gather_unroll8_kernel),
        ("take", _gather_take_kernel),
    ]:
        try:
            run = make_pallas_gather(kernel)
            out = run(tbl, idx)
            ok = bool(jnp.all(out == ref))

            def body(c, run=run):
                return run(tbl * c[0, 0], idx) + c * 0.5

            t = scan_time(body, x0)
            print(f"pallas {name:8}: {t:7.4f} ms   correct={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"pallas {name:8}: FAILED — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
