"""Mood classification CNN (Flax) — replaces the reference's Keras
``mood_cnn_augmented_model.keras`` (ai_tagger.py:19, 39; N8).

The reference's trained weights are ABSENT from its snapshot
(.MISSING_LARGE_BLOBS), so weight conversion is impossible by construction
(SURVEY.md §7.4 item 7). The interface contract is preserved exactly:
128x128x3 normalized mel-spectrogram image in, 4-way softmax over the
label-encoder classes out. Weights load from a checkpoint when present
(AME_TPU_MOOD_WEIGHTS or the package-local default); otherwise a
deterministic seed-0 initialization keeps the pipeline functional, and
``train_step`` / models/train_mood.py provide the retraining path.

Class order matches the reference's sklearn LabelEncoder (alphabetical —
decoded from mood_cnn_label_encoder.joblib, SURVEY.md §0).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import serialization

MOOD_CLASSES = ("Angry/Anxious", "Calm/Content", "Happy/Excited",
                "Sad/Depressed")
IMG_SIZE = 128

_DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__),
                                "mood_cnn_weights.msgpack")


class MoodCNN(nn.Module):
    """Small conv net sized for a 128x128x3 spectrogram image.

    Channel widths are multiples of 32 — everything lands on the MXU in
    bf16-friendly shapes. The head is global-average-pool + small dense
    layers rather than a flattened 32k-wide dense: ~130k parameters total
    (a ~0.5 MB shippable checkpoint instead of 33 MB) and far less prone
    to memorizing a small training corpus."""

    num_classes: int = len(MOOD_CLASSES)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feat in (32, 64, 128):
            x = nn.Conv(feat, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 128]
        x = nn.Dense(128)(x)
        x = nn.relu(x)
        if train:
            x = nn.Dropout(0.3, deterministic=False)(x)
        x = nn.Dense(self.num_classes)(x)
        return x


_params_cache = None


def init_params(rng_seed: int = 0):
    model = MoodCNN()
    dummy = jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(rng_seed), dummy)["params"]


def load_params(path: str | None = None):
    """Load weights; deterministic init when no checkpoint exists (the
    reference returns (None, None) and errors out of analysis in that case —
    we stay functional instead, flagging untrained via `trained`)."""
    global _params_cache
    if _params_cache is not None:
        return _params_cache
    path = path or os.environ.get("AME_TPU_MOOD_WEIGHTS", _DEFAULT_WEIGHTS)
    params = init_params()
    trained = False
    if os.path.exists(path):
        with open(path, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        trained = True
    # from_bytes leaves are host numpy; device_put ONCE or every inference
    # dispatch re-uploads all 440 KB of weights — over the tunneled TPU
    # (~30 MB/s) that was 11 of the Musicologist's 17 ms device time
    # (round-4 profiling: the CNN fell 11 ms -> 0.3 ms with resident
    # weights).
    params = jax.device_put(params)
    _params_cache = (params, trained)
    return _params_cache


def save_params(params, path: str | None = None) -> str:
    path = path or _DEFAULT_WEIGHTS
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def _conv3x3_matmul(x, kernel, bias):
    """3x3 SAME conv as nine shifted slices + ONE MXU matmul.

    XLA's conv lowering on this TPU runtime costs ~13 ms for the whole
    batch-1 CNN (165 MFLOPs — pathological); patch extraction by slicing
    is free layout work and the contraction is a single well-shaped
    matmul. Matches flax's nn.Conv (cross-correlation, SAME padding) up to
    bf16 input rounding: patches channel index (dy*3 + dx)*Cin + ci matches
    kernel.reshape(9*Cin, Cout) row order.

    Inference contracts in bf16 with f32 accumulation — the MXU's native
    mode (~8x the fp32 pass rate). Classification is argmax over logits
    whose class gaps are O(1); bf16 input rounding perturbs logits by
    ~1e-2, and the bf16 path agrees with f32 on 16/16 out-of-family
    validation tracks (and identical in-family accuracy) — the decision,
    not the last logit bits, is the contract. Training stays f32 (flax
    module path in loss_fn)."""
    B, H, W, Ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.bfloat16)
    cols = [xp[:, dy:dy + H, dx:dx + W, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)             # [B, H, W, 9*Ci]
    wmat = kernel.reshape(9 * Ci, -1).astype(jnp.bfloat16)
    return jnp.einsum("bhwk,kc->bhwc", patches, wmat,
                      preferred_element_type=jnp.float32) + bias


@jax.jit
def predict_logits(params, batch):
    """batch: [B, 128, 128, 3] -> [B, 4] logits. Inference re-expressed
    as slice-im2col matmuls over the SAME checkpoint tree (training keeps
    the flax module)."""
    x = batch
    for i in range(3):
        layer = params[f"Conv_{i}"]
        x = jax.nn.relu(_conv3x3_matmul(x, layer["kernel"], layer["bias"]))
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))
    x = x.mean(axis=(1, 2))                              # GAP -> [B, 128]
    x = jax.nn.relu(x @ params["Dense_0"]["kernel"]
                    + params["Dense_0"]["bias"])
    return x @ params["Dense_1"]["kernel"] + params["Dense_1"]["bias"]


def predict_mood(params, image) -> str:
    """Single-image path parity with ai_tagger.py:70-73 (batch of 1,
    argmax, inverse label transform)."""
    logits = predict_logits(params, image[None])
    return MOOD_CLASSES[int(jnp.argmax(logits[0]))]


# ---------------------------------------------------------------------------
# Training step (used by models/train_mood.py and the multichip dryrun)
# ---------------------------------------------------------------------------

def loss_fn(params, batch, labels, dropout_rng):
    logits = MoodCNN().apply({"params": params}, batch, train=True,
                             rngs={"dropout": dropout_rng})
    one_hot = jax.nn.one_hot(labels, len(MOOD_CLASSES))
    loss = -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(logits), axis=-1))
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, acc


def make_train_step(optimizer):
    """Returns a jittable (params, opt_state, batch, labels, rng) step."""

    def train_step(params, opt_state, batch, labels, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, labels, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates)
        return params, opt_state, loss, acc

    return train_step
