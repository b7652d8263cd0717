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


# ---------------------------------------------------------------------------
# 2-bit packed-word helpers (shared by the call-step front-end kernel)
#
# Packed layout = ops.bloom_jax.pack2bit_jax: 16 bases per uint32 word,
# base 0 in the TOP 2 bits, so uint32 tuple comparison == ASCII strcmp
# (A=0 < C=1 < G=2 < T=3 preserves ASCII order).
# ---------------------------------------------------------------------------


def _decode_byte_cols(jnp, words, n_bases: int):
    """ASCII byte columns (uint32) of an n_bases-long packed sequence."""
    cols = []
    for j in range(n_bases):
        w = words[j // 16]
        sh = 2 * (15 - (j % 16))
        c = (w >> sh) & jnp.uint32(3) if sh else w & jnp.uint32(3)
        b = (
            jnp.uint32(65)
            + (c << 1)
            + jnp.where(c == 2, jnp.uint32(2), jnp.uint32(0))
            + jnp.where(c == 3, jnp.uint32(13), jnp.uint32(0))
        )
        cols.append(b)
    return cols


def _rev2bit(jnp, x):
    """Reverse the 16 2-bit groups of each uint32."""
    m2 = jnp.uint32(0x33333333)
    x = ((x & m2) << 2) | ((x >> 2) & m2)
    m4 = jnp.uint32(0x0F0F0F0F)
    x = ((x & m4) << 4) | ((x >> 4) & m4)
    m8 = jnp.uint32(0x00FF00FF)
    x = ((x & m8) << 8) | ((x >> 8) & m8)
    return (x << 16) | (x >> 16)


def _extract_subpacked(jnp, words, off: int, k: int):
    """Packed words of the length-k subsequence starting at base off."""
    w_k = (k + 15) // 16
    s = 2 * (off % 16)
    a0 = off // 16
    out = []
    for i in range(w_k):
        w1 = words[a0 + i] if a0 + i < len(words) else None
        w2 = words[a0 + i + 1] if a0 + i + 1 < len(words) else None
        if s == 0:
            v = w1
        else:
            v = w1 << s
            if w2 is not None:
                v = v | (w2 >> (32 - s))
        out.append(v)
    tail = k - 16 * (w_k - 1)
    if tail < 16:
        mask = jnp.uint32((((1 << (2 * tail)) - 1) << (32 - 2 * tail)) & 0xFFFFFFFF)
        out[-1] = out[-1] & mask
    return out


def _revcomp_packed(jnp, words, k: int):
    """Reverse complement of a k-base packed-word sequence (pure ACGT:
    complement code = code ^ 3)."""
    w_k = len(words)
    comp = []
    for i, w in enumerate(words):
        nb = min(16, k - 16 * i)
        m = jnp.uint32((((1 << (2 * nb)) - 1) << (32 - 2 * nb)) & 0xFFFFFFFF)
        comp.append(w ^ m)
    v = [_rev2bit(jnp, comp[w_k - 1 - i]) for i in range(w_k)]
    t = 2 * (16 * w_k - k)  # garbage-base lead to shift out (0..30)
    if t == 0:
        return v
    out = []
    for i in range(w_k):
        x = v[i] << t
        if i + 1 < w_k:
            x = x | (v[i + 1] >> (32 - t))
        out.append(x)
    return out


def _lex_min_packed(jnp, a, b):
    """Per-lane lexicographic min of two packed-word tuples (+ the strcmp
    tie rule: ties keep b, matching seq.canonical — equal either way)."""
    less = jnp.zeros(a[0].shape, dtype=jnp.bool_)
    decided = jnp.zeros(a[0].shape, dtype=jnp.bool_)
    for i in range(len(a)):
        less = less | (~decided & (a[i] < b[i]))
        decided = decided | (a[i] != b[i])
    return [jnp.where(less, a[i], b[i]) for i in range(len(a))]


@functools.lru_cache(maxsize=None)
def make_callstep_hash_fn(k: int, ref_k: int, tile_rows: int = 32,
                          interpret: bool = False, with_ctx: bool = True):
    """Fused call-step front end: the entire per-k-mer VPU workload of hot
    loop D (reference main.cpp:487-500) in one VMEM pass.

    Input: the 2-bit packed canonical sample contexts as ``wc`` uint32
    matrices of shape (R, 128) — lane-major tiles of the batch
    (wc = ceil(ref_k/16)).  Per lane the kernel computes:

    * (``with_ctx`` only) the XXH3_64 of the context's ASCII form
      (decoded in VMEM),
    * the packed canonical centered k-mer (revcomp + lexicographic min
      done in 2-bit space — ~60 ops instead of byte-wise compare chains),
    * the XXH3_64 of the canonical center's ASCII form.

    Returns (ctx_hi, ctx_lo, c_hi, c_lo, can_0..can_{w_k-1}) — without the
    first two when ``with_ctx=False`` (the lane-compacted call step only
    needs the context hash for the few "interesting" lanes, so it defers
    it to a cap-sized XLA pass and skips ~half the VPU work here) — each
    (R, 128) uint32.  Bit-identical to the XLA ops path (parity-tested);
    the win is that no byte matrices or hash intermediates ever touch HBM.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .xxh3_jax import xxh3_64_cols

    wc = (ref_k + 15) // 16
    w_k = (k + 15) // 16
    off = (ref_k - k) // 2
    n_out = (4 if with_ctx else 2) + w_k

    def kernel(*refs):
        words = [r[:, :] for r in refs[:wc]]
        outs = refs[wc:]

        at = 0
        if with_ctx:
            ctx_cols = _decode_byte_cols(jnp, words, ref_k)
            xh, xl = xxh3_64_cols(ctx_cols)
            outs[0][:, :] = xh
            outs[1][:, :] = xl
            at = 2

        cen = _extract_subpacked(jnp, words, off, k)
        rc = _revcomp_packed(jnp, cen, k)
        can = _lex_min_packed(jnp, cen, rc)
        ch, cl = xxh3_64_cols(_decode_byte_cols(jnp, can, k))
        outs[at][:, :] = ch
        outs[at + 1][:, :] = cl
        for i in range(w_k):
            outs[at + 2 + i][:, :] = can[i]

    def fn(*word_mats):
        R = word_mats[0].shape[0]
        tile = min(tile_rows, R)
        assert R % tile == 0, "row count must be a multiple of the tile"
        spec = pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((R, 128), jnp.uint32)
        return pl.pallas_call(
            kernel,
            grid=(R // tile,),
            out_shape=(out,) * n_out,
            in_specs=[spec] * wc,
            out_specs=(spec,) * n_out,
            interpret=interpret,
        )(*word_mats)

    return jax.jit(fn)


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
