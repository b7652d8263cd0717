"""Device mesh construction helpers.

The genotyper scales along two axes (SURVEY.md §2 "parallelism"):
  * ``shard`` — the k-mer index (Bloom words, counters, exact map) is
    hash-range sharded across devices, the TP analog; and
  * ``data`` — read batches stream data-parallel.
For the current query design the two collapse onto one axis: every device
owns one index shard and one read shard, read batches are all-gathered
within ``shard``, and context-membership bits are merged with a psum.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int | None = None, axis: str = "shard"):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
