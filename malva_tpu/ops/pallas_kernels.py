"""Pallas TPU kernels for the window-hash hot path.

The reference scan (hot loop C) and read k-merization hash every
length-ref_k window of a long sequence.  Done with stock XLA ops this
materializes a (N, ref_k) window matrix plus intermediate u32 arrays in
HBM; the Pallas kernel streams the sequence through VMEM in tiles and
computes, per position, the canonical centered-k-mer hash and the
canonical context hash entirely on the VPU — windows never exist in HBM.
Byte "columns" are lane-rotations (pltpu.roll) of the VMEM tile, and the
hashes use the column-based XXH3 from ops.xxh3_jax (bit-identical to the
host path; parity-tested).

Mosaic constraints worked around (this toolchain rejects them):
* no uint8 DMA -> the sequence is pre-widened to one uint32 per base
  (input traffic is trivial next to the compute);
* no unaligned VMEM slices -> columns come from pltpu.roll + aligned
  slice, and the DMA halo is padded to 128 lanes.

fn(ref_chunk_u32) with shape (1, n_pos + 128) returns
(center_hi, center_lo, ctx_hi, ctx_lo), each (1, n_pos) uint32.
"""

from __future__ import annotations

import functools


HALO = 128  # >= ref_k - 1, lane-aligned


def _canonical_cols(jnp, cols):
    """Canonical form of per-position windows given as value columns
    (uint32 byte values).  Replicates seq.canonical's strcmp semantics."""
    L = len(cols)

    def comp(c):
        out = jnp.zeros_like(c)
        for src, dst in [
            (b"A", b"T"), (b"C", b"G"), (b"G", b"C"), (b"N", b"N"), (b"T", b"A"),
            (b"a", b"T"), (b"c", b"G"), (b"g", b"G"), (b"n", b"N"), (b"t", b"A"),
        ]:
            out = jnp.where(c == src[0], jnp.full_like(c, dst[0]), out)
        return out

    rc = [comp(cols[L - 1 - j]) for j in range(L)]
    less = jnp.zeros(cols[0].shape, dtype=jnp.bool_)
    decided = jnp.zeros(cols[0].shape, dtype=jnp.bool_)
    for j in range(L):
        less = less | (~decided & (cols[j] < rc[j]))
        decided = decided | (cols[j] != rc[j])
    return [jnp.where(less, cols[j], rc[j]) for j in range(L)]


@functools.lru_cache(maxsize=None)
def make_window_hash_fn(k: int, ref_k: int, tile: int, interpret: bool = False):
    """Build the jitted Pallas window-hash function (see module doc)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .xxh3_jax import xxh3_64_cols

    assert ref_k - 1 <= HALO
    off = (ref_k - k) // 2
    W = tile + HALO

    def kernel(ref_hbm, c_hi, c_lo, x_hi, x_lo):
        i = pl.program_id(0)

        def body(scratch, sem):
            cp = pltpu.make_async_copy(
                ref_hbm.at[:, pl.ds(i * tile, W)], scratch, sem
            )
            cp.start()
            cp.wait()
            data = scratch[:, :]

            def col(j):
                return pltpu.roll(data, W - j, axis=1)[:, 0:tile]

            cols = [col(j) for j in range(ref_k)]

            ctx = _canonical_cols(jnp, cols)
            xh, xl = xxh3_64_cols(ctx)
            x_hi[:, :] = xh
            x_lo[:, :] = xl

            cen = _canonical_cols(jnp, cols[off : off + k])
            ch, cl = xxh3_64_cols(cen)
            c_hi[:, :] = ch
            c_lo[:, :] = cl

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((1, W), jnp.uint32),
            sem=pltpu.SemaphoreType.DMA,
        )

    def fn(ref_chunk):
        n_pos = ref_chunk.shape[1] - HALO
        assert n_pos % tile == 0, "n_pos must be a multiple of the tile size"
        grid = (n_pos // tile,)
        out = jax.ShapeDtypeStruct((1, n_pos), jnp.uint32)
        ospec = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=(out, out, out, out),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(ospec, ospec, ospec, ospec),
            interpret=interpret,
        )(ref_chunk)

    return jax.jit(fn)
