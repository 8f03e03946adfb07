"""Proton -> lung-mask segmentation model (U-Net) + sharded training step.

The reference lists "automatic segmentation using proton (maybe DL this?)"
as a roadmap item (README.md:22-30, Vent_Analysis.py:1019-1026); masks are
otherwise drawn by hand and loaded from a DICOM folder.  This module
provides that capability TPU-first:

- a compact 2-D U-Net (flax) applied slice-wise to [N,H,W,D] proton volumes;
- a jitted optax train step (masked BCE + Dice) that shards over a
  ("batch", "space") mesh: data parallel over subjects, spatial-parallel
  over image rows — XLA inserts the conv halo exchanges for the spatial
  axis automatically from the sharding annotations;
- predict_mask for inference inside the analysis pipeline.

Training data comes from the synthetic phantom generator or from existing
hand-segmented studies.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class _ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3))(x)
        x = nn.gelu(x)
        x = nn.Conv(self.features, (3, 3))(x)
        return nn.gelu(x)


class SegUNet(nn.Module):
    """2-D U-Net over [N, H, W, C] slices (C=1 proton intensity)."""
    base: int = 16

    @nn.compact
    def __call__(self, x):
        c1 = _ConvBlock(self.base)(x)
        d1 = nn.avg_pool(c1, (2, 2), strides=(2, 2))
        c2 = _ConvBlock(self.base * 2)(d1)
        d2 = nn.avg_pool(c2, (2, 2), strides=(2, 2))
        c3 = _ConvBlock(self.base * 4)(d2)
        u2 = jax.image.resize(c3, (*c3.shape[:1], c3.shape[1] * 2,
                                   c3.shape[2] * 2, c3.shape[3]), "nearest")
        c4 = _ConvBlock(self.base * 2)(jnp.concatenate([u2, c2], axis=-1))
        u1 = jax.image.resize(c4, (*c4.shape[:1], c4.shape[1] * 2,
                                   c4.shape[2] * 2, c4.shape[3]), "nearest")
        c5 = _ConvBlock(self.base)(jnp.concatenate([u1, c1], axis=-1))
        return nn.Conv(1, (1, 1))(c5)[..., 0]  # logits [N, H, W]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def _slices(vol4d: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,D] -> [N*D, H, W, 1] slice batch."""
    n, h, w, d = vol4d.shape
    return jnp.transpose(vol4d, (0, 3, 1, 2)).reshape(n * d, h, w, 1)


def create_train_state(
    rng: jax.Array,
    shape: Tuple[int, int] = (128, 128),
    base: int = 16,
    learning_rate: float = 1e-3,
):
    model = SegUNet(base=base)
    params = model.init(rng, jnp.zeros((1, *shape, 1)))
    tx = optax.adam(learning_rate)
    return model, tx, TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def _loss_fn(model, params, proton, mask):
    """Masked BCE + soft-Dice on normalized proton slices."""
    x = _slices(proton)
    y = _slices(mask)[..., 0]
    lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    x = (x - lo) / jnp.maximum(hi - lo, 1e-6)
    logits = model.apply(params, x)
    bce = optax.sigmoid_binary_cross_entropy(logits, y).mean()
    p = jax.nn.sigmoid(logits)
    inter = jnp.sum(p * y, axis=(1, 2))
    dice = 1.0 - (2 * inter + 1.0) / (jnp.sum(p, (1, 2)) + jnp.sum(y, (1, 2)) + 1.0)
    return bce + dice.mean()


def train_step(model, tx, state: TrainState, proton, mask):
    """One optimizer step; pure — jit/shard freely."""
    loss, grads = jax.value_and_grad(
        lambda p: _loss_fn(model, p, proton, mask)
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def make_sharded_train_step(model, tx, mesh):
    """jit the train step over a ('batch','space') mesh: inputs sharded
    [N@batch, H@space, W, D], params/opt replicated; XLA derives the conv
    halo exchanges on the spatial axis from these annotations."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sharding = NamedSharding(mesh, P("batch", "space"))
    repl = NamedSharding(mesh, P())

    def step(state, proton, mask):
        new_state, loss = train_step(model, tx, state, proton, mask)
        return new_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, data_sharding, data_sharding),
        out_shardings=(repl, repl),
    )


def save_checkpoint(path: str, state: TrainState,
                    params_only: bool = False) -> None:
    """Persist training state with orbax (SURVEY.md §5 checkpoint/resume).

    params_only drops the optimizer moments — the form the shipped
    inference artifact (ventjax/models/seg_ckpt) uses, 1/3 the size."""
    import orbax.checkpoint as ocp

    tree = {"params": state.params, "step": state.step}
    if not params_only:
        tree["opt_state"] = state.opt_state
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_checkpoint(path: str) -> TrainState:
    """Restore a checkpoint; params-only artifacts come back with
    opt_state=None (fine for inference; re-init the optimizer to resume
    training).

    Restores as host numpy so a checkpoint written on one backend (the
    artifact is trained on TPU) loads on any other (CPU tests) — orbax
    otherwise demands the saved sharding's device."""
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    item = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    item_tree = dict(item.tree) if hasattr(item, "tree") else item
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item_tree
    )
    tree = ckptr.restore(path, restore_args=restore_args)
    return TrainState(params=tree["params"],
                      opt_state=tree.get("opt_state"),
                      step=jnp.asarray(tree["step"]))


def default_checkpoint_path() -> str:
    """The shipped domain-randomized segmentation artifact (analyze
    --auto-mask uses it when --seg-ckpt is not given)."""
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "seg_ckpt")


def predict_mask(model, params, proton: jnp.ndarray, thresh: float = 0.5):
    """[H,W,D] or [N,H,W,D] proton -> binary mask of the same shape."""
    single = proton.ndim == 3
    vol = proton[None] if single else proton
    n, h, w, d = vol.shape
    x = _slices(vol.astype(jnp.float32))
    lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    x = (x - lo) / jnp.maximum(hi - lo, 1e-6)
    logits = model.apply(params, x)
    mask = (jax.nn.sigmoid(logits) > thresh).astype(jnp.float32)
    mask = jnp.transpose(mask.reshape(n, d, h, w), (0, 2, 3, 1))
    return mask[0] if single else mask
