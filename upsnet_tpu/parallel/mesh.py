"""Device mesh + sharded train/predict steps.

The reference's entire distributed surface is "shard the sampler, NCCL
all-reduce the grads" (SURVEY.md §2.6, §5.8). TPU-native equivalent:
single-controller JAX with a 1-D ``Mesh(('data',))`` over all chips;
parameters replicated, batch sharded on 'data'; XLA inserts the gradient
psum when the jitted train step consumes batch-sharded inputs and produces
replicated parameter updates — collectives ride ICI (DCN across hosts is
handled by the runtime).

Scaling beyond DP (the reference has none) is available via the same mesh:
pass ``spatial`` > 1 to add a model axis for spatially-sharded dense heads
on very large inputs (the SURVEY.md §5.7 Cityscapes analogue).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, spatial: int = 1) -> Mesh:
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    n = len(devs)
    assert n % spatial == 0, (n, spatial)
    arr = np.array(devs).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
