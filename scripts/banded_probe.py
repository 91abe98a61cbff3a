"""Microprobe: banded (scan + dynamic_slice) gather vs plain XLA gather.

BASELINE.md capacity sweep established that XLA TPU row-gather cost grows
with the TABLE's row count (~1.5 ns/row at 38k rows, 3.4 at 307k, 8 at
614k) independent of bytes and index locality. The backward reverse-
gathers read EDGE-sized tables (E = N*K rows) and dominate the step
beyond ~300k edges. If indices are BANDED (|idx - row*K| <= band, true
for x-sorted nodes whose neighbors are index-local), each output tile
only needs a small dynamic_slice of the table — a subtable in the fast
gather regime.

Run on the real TPU:
    timeout 570 python scripts/banded_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")


def plain(table, idx):
    return table[idx.reshape(-1)].reshape(idx.shape + (table.shape[-1],))


def banded(table, idx, band_rows, tile_rows):
    """table[idx] where idx[i] (flattened output row i, out of R rows
    with table rows E) satisfies |idx[i] - i * E / R| <= band_rows."""
    e, h = table.shape
    flat = idx.reshape(-1)
    r = flat.shape[0]
    assert r % tile_rows == 0
    n_tiles = r // tile_rows
    stride = e / r
    slice_rows = int(tile_rows * stride) + 2 * band_rows
    slice_rows = -(-slice_rows // 512) * 512
    slice_rows = min(slice_rows, e)
    idx_tiles = flat.reshape(n_tiles, tile_rows)
    starts = jnp.clip(
        (jnp.arange(n_tiles) * tile_rows * stride).astype(jnp.int32) - band_rows,
        0,
        e - slice_rows,
    )

    def body(_, xs):
        start, it = xs
        sub = jax.lax.dynamic_slice(table, (start, 0), (slice_rows, h))
        return None, sub[it - start]

    _, out = jax.lax.scan(body, None, (starts, idx_tiles))
    return out.reshape(idx.shape + (h,))


def bench(fn, *args, iters=20):
    # sync via a scalar fetch (block_until_ready is unreliable through the
    # remote tunnel — CLAUDE.md); never fetch full arrays (the tunnel is
    # tens of MB/s)
    sync = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    float(sync(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import os

    h, k = 64, 8
    tiles = [int(t) for t in os.environ.get("TILES", "4096").split(",")]
    sizes = os.environ.get("SIZES", "303104:700,614400:700")
    print(f"device: {jax.devices()[0]}", flush=True)
    for part in sizes.split(","):
        n_nodes, w_nodes = (int(x) for x in part.split(":"))
        e = n_nodes * k
        rng = np.random.default_rng(0)
        # banded indices: reverse positions of an x-sorted lattice —
        # senders within w_nodes of each node
        v = np.arange(n_nodes)
        send = v[:, None] + rng.integers(-w_nodes, w_nodes + 1, (n_nodes, k))
        send = np.clip(send, 0, n_nodes - 1)
        kp = rng.integers(0, k, (n_nodes, k))
        idx = jnp.asarray((send * k + kp).astype(np.int32))
        table = jnp.asarray(
            rng.normal(size=(e, h)).astype(np.float32), dtype=jnp.bfloat16
        )

        jp = jax.jit(plain)
        ref = jp(table, idx)  # stays on device; compare there too
        t_plain = bench(jp, table, idx)
        print(f"E={e/1e6:.2f}M rows, w={w_nodes}: plain {t_plain:.2f} ms", flush=True)

        eq = jax.jit(lambda a, b: jnp.all(a == b))
        for tile_nodes in tiles:
            if n_nodes % tile_nodes:
                continue
            jb = jax.jit(
                lambda t, i, tn=tile_nodes: banded(t, i, (w_nodes + 1) * k, tn * k)
            )
            ok = bool(eq(jb(table, idx), ref))
            t_b = bench(jb, table, idx)
            print(
                f"  banded(tile={tile_nodes}) {t_b:.2f} ms "
                f"({t_plain/t_b:.2f}x) exact={ok}",
                flush=True,
            )


if __name__ == "__main__":
    main()
