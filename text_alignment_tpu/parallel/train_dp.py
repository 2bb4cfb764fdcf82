"""Sharded CTC training step: data parallelism over lines, tensor
parallelism over the recognizer's output projection.

Sharding layout over a ('data', 'model') mesh:
- batch inputs (frames, lengths, labels) sharded along 'data';
- the softmax projection W2 (nout, 2ns+1) sharded along 'model' on the
  class dim — the widest matmul in the model — with CTC loss computed from
  the all-gathered logits;
- the LSTM recurrent weights replicated (they are tiny; sharding them would
  put an all-gather inside the time scan).

XLA GSPMD inserts the gradient all-reduces over ICI; there is no hand-rolled
collective code (scaling-book recipe: annotate, let the compiler place
collectives, profile).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lstm_jax import BiLSTMParams, LSTMParams, init_bilstm
from ..models.train import bilstm_logits
from ..models.ctc import ctc_loss
from ..models.codec import Codec


def _param_shardings(mesh: Mesh) -> BiLSTMParams:
    rep = NamedSharding(mesh, P())
    lstm_rep = LSTMParams(*([rep] * len(LSTMParams._fields)))
    return BiLSTMParams(
        fwd=lstm_rep, bwd=lstm_rep,
        W2=NamedSharding(mesh, P("model", None)),
    )


def make_sharded_train_step(mesh: Mesh, optimizer):
    """Returns (train_step, shard_params, shard_batch)."""
    p_shard = _param_shardings(mesh)
    data_s = NamedSharding(mesh, P("data"))
    data3_s = NamedSharding(mesh, P("data", None, None))
    data2_s = NamedSharding(mesh, P("data", None))

    @jax.jit
    def train_step(params, opt_state, xs, xlens, labels, llens):
        def loss_fn(p):
            logits = bilstm_logits(p, xs, xlens)
            return ctc_loss(logits, xlens, labels, llens)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_params(params):
        return jax.device_put(params, p_shard)

    def shard_batch(xs, xlens, labels, llens):
        return (
            jax.device_put(jnp.asarray(xs, jnp.float32), data3_s),
            jax.device_put(jnp.asarray(xlens, jnp.int32), data_s),
            jax.device_put(jnp.asarray(labels, jnp.int32), data2_s),
            jax.device_put(jnp.asarray(llens, jnp.int32), data_s),
        )

    return train_step, shard_params, shard_batch


def sharded_train_demo_step(mesh: Mesh, batch_per_device: int = 2,
                            T: int = 64, ni: int = 16, ns: int = 16,
                            seed: int = 0) -> float:
    """Build a full sharded training step on the given mesh and run ONE
    update on tiny shapes; returns the (finite) loss. Used by the
    multi-chip dry run."""
    codec = Codec(["", "~", " ", "a", "b", "c"])
    n_data = mesh.shape["data"]
    B = batch_per_device * n_data

    params = init_bilstm(jax.random.PRNGKey(seed), ni, ns, len(codec))
    optimizer = optax.adam(1e-3)

    train_step, shard_params, shard_batch = make_sharded_train_step(
        mesh, optimizer
    )

    with mesh:
        params = shard_params(params)
        opt_state = optimizer.init(params)

        rng = np.random.default_rng(seed)
        xs = rng.normal(0, 1, (B, T, ni)).astype(np.float32)
        xlens = np.full(B, T, np.int32)
        labels = np.tile(np.array([[3, 4, 5, 0]], np.int32), (B, 1))
        llens = np.full(B, 3, np.int32)
        batch = shard_batch(xs, xlens, labels, llens)

        params, opt_state, loss = train_step(params, opt_state, *batch)
        loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    return loss
