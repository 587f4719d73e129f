"""Differentiable auto-mastering: fit MasterSettings by gradient descent.

A capability the reference cannot have: its chain runs through ffmpeg
subprocesses. Here every gain/width/character parameter is a traced scalar
and every kernel is differentiable jnp, so the whole mastering chain is a
differentiable function of its settings. Given a reference track (or target
spectral profile), we optimize the EQ/width/character parameters so the
mastered output's log-mel spectrum matches the target's — the "make my mix
sound like that record" workflow, on-device.

(See PAPERS.md: hyperconditioned differentiable biquads / deep parametric
IIR optimization — this module is that idea applied to the full chain.)
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ame_tpu.ops import eq, saturate, stereo


N_MELS = 64
N_FFT = 2048
HOP = 1024


def _logmel_profile(x: jax.Array, sample_rate: float) -> jax.Array:
    """Time-averaged log-mel energy profile [N_MELS] of a stereo track."""
    from ame_tpu.analysis.stft import melspectrogram
    mono = jnp.mean(x, axis=1)
    mel = melspectrogram(mono, float(sample_rate), N_FFT, N_MELS, HOP)
    return 10.0 * jnp.log10(jnp.maximum(jnp.mean(mel, axis=1), 1e-10))


def _chain(x, theta, sample_rate):
    """Differentiable sub-chain: analog character + quality EQ + width.
    theta: dict of unconstrained parameters."""
    analog = 50.0 * jax.nn.sigmoid(theta["analog_raw"])      # [0, 50] %
    width = 2.0 * jax.nn.sigmoid(theta["width_raw"])         # [0, 2]
    gains = 6.0 * jnp.tanh(theta["eq_raw"])                  # [-6, 6] dB
    y = saturate.analog_character_quality(x, sample_rate, analog)
    y = eq.apply_eq_quality(y, sample_rate, gains[0], -gains[1], gains[2],
                            gains[3])
    y = stereo.stereo_width_quality(y, width)
    return y


def _theta_to_settings(theta) -> dict:
    analog = float(50.0 * jax.nn.sigmoid(theta["analog_raw"]))
    width = float(2.0 * jax.nn.sigmoid(theta["width_raw"]))
    gains = np.asarray(6.0 * jnp.tanh(theta["eq_raw"]))
    return {
        "analog_character": analog,
        "bass_boost": float(gains[0]),
        "mid_cut": float(-gains[1]),
        "presence_boost": float(gains[2]),
        "treble_boost": float(gains[3]),
        "width": width,
    }


@partial(jax.jit, static_argnums=(3,))
def _loss_fn(theta, x, target_profile, sample_rate):
    y = _chain(x, theta, sample_rate)
    prof = _logmel_profile(y, sample_rate)
    return jnp.mean((prof - target_profile) ** 2)


def fit_settings(x: jax.Array, sample_rate: float,
                 target: jax.Array | np.ndarray,
                 target_is_profile: bool = False,
                 steps: int = 200, lr: float = 0.05,
                 verbose: bool = False) -> dict:
    """Fit EQ/width/character so ``x`` spectrally matches ``target``.

    Args:
      x: [N, 2] source track.
      target: [M, 2] reference track, or a precomputed [N_MELS] log-mel
        profile when ``target_is_profile``.
      steps / lr: Adam schedule.

    Returns a reference-schema settings dict (add lufs/multiband yourself).
    """
    x = jnp.asarray(x, jnp.float32)
    if target_is_profile:
        target_profile = jnp.asarray(target, jnp.float32)
    else:
        target_profile = _logmel_profile(
            jnp.asarray(target, jnp.float32), sample_rate)

    theta = {
        "analog_raw": jnp.float32(-4.0),   # sigmoid(-4) ~ 0: start clean
        "width_raw": jnp.float32(0.0),     # width 1.0
        "eq_raw": jnp.zeros(4, jnp.float32),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(theta)
    grad_fn = jax.jit(jax.grad(_loss_fn), static_argnums=(3,))

    for i in range(steps):
        g = grad_fn(theta, x, target_profile, float(sample_rate))
        updates, opt_state = opt.update(g, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        if verbose and i % 20 == 0:
            loss = float(_loss_fn(theta, x, target_profile,
                                  float(sample_rate)))
            print(f"automaster step {i}: loss {loss:.4f}")

    out = _theta_to_settings(theta)
    out["loss"] = float(_loss_fn(theta, x, target_profile,
                                 float(sample_rate)))
    return out
