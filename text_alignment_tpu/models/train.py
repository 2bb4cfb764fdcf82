"""CTC training for the line recognizer — the ocropus-rtrain equivalent
(reference workflow: README.md:52-56, SURVEY.md §3.5).

A jitted optax train step over the batched BiLSTM. The forward reuses the
inference code path but takes logits pre-softmax for a numerically stable
CTC loss. Checkpoints are written in the reference's iteration-stamped
``*-NNNNNNNN.pyrnn.gz`` shape via :mod:`.pyrnn`, so trained models plug into
the same alignment pipeline (and back into the reference's tooling).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .codec import Codec
from .lstm_jax import (
    BiLSTMParams,
    init_bilstm,
    _bidir_scan,
    _reverse_by_length,
    params_to_np,
)
from .ctc import ctc_loss
from .pyrnn import save_pyrnn


def bilstm_logits(params: BiLSTMParams, xs, lengths):
    """(B, T, nout) UN-normalized logits (clipped like the reference's
    softmax layer)."""
    f, b_rev = _bidir_scan(params.fwd, params.bwd, xs,
                           _reverse_by_length(xs, lengths))
    b = _reverse_by_length(b_rev, lengths)
    y = jnp.concatenate([f, b], axis=2)
    ones = jnp.ones(y.shape[:2] + (1,), jnp.float32)
    inputs = jnp.concatenate([ones, y], axis=2)
    logits = jnp.einsum(
        "btk,ok->bto", inputs, params.W2, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.clip(logits, -100, 100)


def make_train_step(optimizer, space_index: int | None = None):
    """Build the jitted CTC train step.

    The step takes a (traced, so schedule changes never recompile)
    ``ground_weight``: when > 0 it adds the ink-grounding auxiliary loss —
    frames whose normalized input column carries no ink should emit blank
    (or space: inter-word gaps ARE empty frames), making emission paths at
    inkless frames expensive. Measured (r3, synthetic corpus): the term
    trains stably but did NOT improve held-out llocs/box quality — the
    clipped recipe's position weakness was a train/test distribution gap,
    fixed by training on representative (skewed/speckled) pages instead
    (see examples/end_to_end_synthetic.py). Kept as an experimentation
    knob; default off."""

    def _build(grounded: bool):
        @jax.jit
        def train_step(params, opt_state, xs, xlens, labels, llens, gw):
            def loss_fn(p):
                logits = bilstm_logits(p, xs, xlens)
                loss = ctc_loss(logits, xlens, labels, llens)
                if not grounded:
                    return loss
                logp = jax.nn.log_softmax(logits, axis=-1)
                ok = logp[..., 0]  # blank
                if space_index is not None:
                    ok = jnp.logaddexp(ok, logp[..., space_index])
                valid = jnp.arange(xs.shape[1])[None, :] < xlens[:, None]
                # normalized frames are ink=1 background=0; interpolation
                # bleed stays well under 0.05 column mass
                empty = (xs.sum(axis=-1) < 0.05) & valid
                n = jnp.maximum(jnp.sum(empty), 1)
                aux = jnp.sum(jnp.where(empty, -ok, 0.0)) / n
                return loss + gw * aux

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step

    # two programs selected host-side: gw is traced WITHIN the grounded
    # program (phased recipes that vary a nonzero weight never recompile),
    # but the default gw == 0 path must not pay the aux term at all — XLA
    # can't dead-code-eliminate a traced-scalar-weighted branch, so a
    # single program would tax every default step with a full-logits
    # log_softmax forward AND its backward
    plain = _build(False)
    grounded_step = _build(True)

    def train_step(params, opt_state, xs, xlens, labels, llens, gw):
        if float(gw) == 0.0:
            return plain(params, opt_state, xs, xlens, labels, llens, gw)
        return grounded_step(params, opt_state, xs, xlens, labels, llens,
                             gw)

    return train_step


@dataclass
class Trainer:
    """Minimal CTC trainer over (frames, text) line pairs."""

    codec: Codec
    ni: int = 48
    ns: int = 100
    lr: float = 1e-3
    seed: int = 0
    clip_norm: float | None = 1.0
    ground_weight: float = 0.0

    def __post_init__(self):
        self.params = init_bilstm(
            jax.random.PRNGKey(self.seed), self.ni, self.ns, len(self.codec)
        )
        # Global-norm clipping: CTC training starts in a blank-collapse
        # plateau whose escape gradients are huge; clipped Adam converges
        # ~7x faster (loss < 0.15 in ~450 iters vs ~2400 unclipped on the
        # synthetic corpus). r2 measured clipped models producing worse
        # held-out box positions (ink IoU 0.34-0.38 vs 0.54 gradual) and
        # attributed it to "bunched" CTC alignments; r3 re-measurement
        # showed train-line positions are equivalent (both lag ~+1.5
        # char widths with similar spread — the normal CTC late-emission
        # bias) and the held-out gap disappears when the training pool
        # includes pages from the evaluation distribution (skew+speckle):
        # clipped training then reaches ink IoU 0.59-0.60 in ~450 iters.
        # Keep clipping on; fix generalization with data, not step size.
        inner = optax.adam(self.lr)
        self.optimizer = (
            optax.chain(optax.clip_by_global_norm(self.clip_norm), inner)
            if self.clip_norm is not None else inner
        )
        self.opt_state = self.optimizer.init(self.params)
        self._step = make_train_step(
            self.optimizer, space_index=self.codec.char2code.get(" "),
        )
        self.iteration = 0

    def step(self, xs, xlens, labels, llens,
             ground_weight: float | None = None) -> float:
        """One update. xs: (B, T, ni) float32; labels: (B, S) int32.
        ``ground_weight`` overrides the trainer default for this step (it
        is a traced scalar, so phased recipes never recompile)."""
        gw = self.ground_weight if ground_weight is None else ground_weight
        self.params, self.opt_state, loss = self._step(
            self.params,
            self.opt_state,
            jnp.asarray(xs),
            jnp.asarray(xlens, jnp.int32),
            jnp.asarray(labels, jnp.int32),
            jnp.asarray(llens, jnp.int32),
            jnp.asarray(gw, jnp.float32),
        )
        self.iteration += 1
        return float(loss)

    def save(self, prefix: str) -> str:
        """Write an iteration-stamped checkpoint like ocropus-rtrain."""
        path = f"{prefix}-{self.iteration:08d}.pyrnn.gz"
        save_pyrnn(path, params_to_np(self.params), self.codec, self.ni)
        return path

    # -- full-state checkpointing (resume with optimizer state) --
    #
    # The .pyrnn.gz checkpoint is the reference-compatible WEIGHT format
    # (loadable by the alignment pipeline and by ocropy tooling), but it
    # drops the Adam moments — resuming from it restarts the optimizer
    # cold. save_state/load_state round-trip the whole training state
    # (params, opt_state, iteration) for exact resume.
    #
    # Format: a .npz archive (leaves as arr_NNN + a JSON config string),
    # loaded with allow_pickle=False — unlike the reference-mandated
    # pickle surfaces (.pyrnn.gz, OCR caches), loading a .state file
    # cannot execute code. The pytree STRUCTURE is never stored: it is
    # rebuilt from a fresh Trainer with the same config, so only the
    # array leaves ride the file.

    def save_state(self, path: str, extra: dict | None = None) -> str:
        """Write the full training state; resuming from it continues the
        trajectory bit-exactly (tested). ``extra`` stores caller-side
        settings the trainer itself doesn't own but exact resume needs
        (e.g. the CLI's batch size, which shapes its RNG draw stream);
        it round-trips into ``load_state``'s ``loaded_extra``."""
        import io
        import json

        flat, _ = jax.tree_util.tree_flatten(
            {"params": self.params, "opt_state": self.opt_state}
        )
        config = json.dumps(
            {"ni": self.ni, "ns": self.ns, "lr": self.lr,
             "seed": self.seed, "clip_norm": self.clip_norm,
             "ground_weight": self.ground_weight,
             "charset": self.codec.charset,
             "iteration": self.iteration,
             "extra": dict(extra or {})}
        )
        buf = io.BytesIO()
        np.savez(buf, config=np.asarray(config),
                 **{f"arr_{i:03d}": np.asarray(x) for i, x in enumerate(flat)})
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        return path

    @classmethod
    def load_state(cls, path: str) -> "Trainer":
        """Load a save_state checkpoint (.npz; no pickle — loading an
        untrusted .state file cannot execute code, unlike the .pyrnn.gz /
        OCR-pickle surfaces whose format the reference mandates)."""
        import json

        with np.load(path, allow_pickle=False) as z:
            cfg = json.loads(str(z["config"]))
            leaves = [z[k] for k in sorted(z.files) if k.startswith("arr_")]
        tr = cls(codec=Codec(cfg["charset"]), ni=cfg["ni"], ns=cfg["ns"],
                 lr=cfg["lr"], seed=cfg["seed"], clip_norm=cfg["clip_norm"],
                 ground_weight=cfg.get("ground_weight", 0.0))
        _, treedef = jax.tree_util.tree_flatten(
            {"params": tr.params, "opt_state": tr.opt_state}
        )
        state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in leaves]
        )
        tr.params = state["params"]
        tr.opt_state = state["opt_state"]
        tr.iteration = cfg["iteration"]
        tr.loaded_extra = cfg.get("extra", {})
        return tr


def batch_lines(frame_list, text_list, codec: Codec, T: int, S: int):
    """Pack variable-length (frames, text) pairs into fixed (B,T,ni)/(B,S)."""
    B = len(frame_list)
    ni = frame_list[0].shape[1]
    xs = np.zeros((B, T, ni), np.float32)
    xlens = np.zeros(B, np.int32)
    labels = np.zeros((B, S), np.int32)
    llens = np.zeros(B, np.int32)
    for i, (fr, txt) in enumerate(zip(frame_list, text_list)):
        t = min(len(fr), T)
        xs[i, :t] = fr[:t]
        xlens[i] = t
        lab = codec.s2l(txt)[:S]
        labels[i, : len(lab)] = lab
        llens[i] = len(lab)
    return xs, xlens, labels, llens
