"""Sharded mood-CNN training step: data parallelism over the batch axis +
tensor parallelism over the dense head (mesh axes 'data' x 'model').

The reference trains its mood CNN offline in Keras (weights absent from its
snapshot); this is the TPU-native retraining path, and the multichip dryrun
target: one jitted train step whose params/batch shardings put XLA
collectives (psum for gradients across 'data', all-gather for the sharded
dense activations across 'model') on ICI.
"""

from __future__ import annotations


import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ame_tpu.models import mood_cnn


def param_sharding_rules(path: tuple, leaf, mesh: Mesh):
    """Tensor-parallel layout: dense kernels shard the output feature dim
    over 'model'; conv kernels shard output channels; everything else
    replicated."""
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if leaf.ndim == 2:  # dense kernel [in, out]
        return P(None, "model")
    if leaf.ndim == 4:  # conv kernel [h, w, in, out]
        return P(None, None, None, "model")
    if leaf.ndim == 1 and "bias" in joined:
        return P("model") if leaf.shape[0] % mesh.shape["model"] == 0 \
            else P()
    return P()


def shard_params(params, mesh: Mesh):
    def place(path, leaf):
        spec = param_sharding_rules(path, leaf, mesh)
        try:
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        except ValueError:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map_with_path(place, params)


def make_sharded_train_step(mesh: Mesh, learning_rate: float = 1e-3):
    """Returns (init_fn, step_fn):
       init_fn(rng) -> (params, opt_state) already sharded;
       step_fn(params, opt_state, batch, labels, rng)
           -> (params, opt_state, loss, acc), jitted over the mesh."""
    optimizer = optax.adam(learning_rate)

    def init_fn(seed: int = 0):
        params = mood_cnn.init_params(seed)
        params = shard_params(params, mesh)
        opt_state = optimizer.init(params)
        return params, opt_state

    batch_sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def step_fn(params, opt_state, batch, labels, rng):
        (loss, acc), grads = jax.value_and_grad(
            mood_cnn.loss_fn, has_aux=True)(params, batch, labels, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    def place_batch(batch, labels):
        return (jax.device_put(batch, batch_sharding),
                jax.device_put(labels, batch_sharding))

    return init_fn, step_fn, place_batch
