"""Differentiable auto-mastering: fit MasterSettings by gradient descent.

A capability the reference cannot have: its chain runs through ffmpeg
subprocesses. Here every gain/width/character parameter is a traced scalar
and every kernel is differentiable jnp, so the whole mastering chain is a
differentiable function of its settings. Given a reference track (or target
spectral profile), we optimize the EQ/width/character parameters so the
mastered output's log-mel spectrum matches the target's — the "make my mix
sound like that record" workflow, on-device.

Perceptual objective (opt-in pieces):
  * multi-resolution spectral loss — log-mel profiles at several FFT sizes
    (a short window that sees transients + a long window that sees tonal
    balance), the standard multi-resolution STFT loss shape;
  * band-dynamics loss — the per-band standard deviation of framed RMS
    in dB (the spectral profile is blind to dynamics; this term is what
    makes multiband compressor thresholds/ratios identifiable);
  * stereo-field loss — the per-band side/mid energy ratio in dB. The
    spectral profile is computed on the mono mixdown, which IS the mid
    signal, so without this term the width parameter has no gradient
    signal at all;
  * true-peak penalty — hinge on the output's 4x-oversampled true peak
    above a ceiling, so fits stay master-legal instead of trading EQ
    boost against downstream limiting;
  * multiband parameter optimization — the quality multiband compressor
    (graph/multiband.py) is itself differentiable in its thresholds and
    ratios (detector -> release scan -> attack smoother are all scans), so
    ``optimize_multiband=True`` fits the 6 band parameters jointly with
    EQ/width/character.

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
MULTI_RES_FFTS = (512, 2048)    # transient + tonal windows
DYN_FRAME_S = 0.4               # band-dynamics RMS frame (BS.1770 block)


def _logmel_profile(x: jax.Array, sample_rate: float,
                    n_fft: int = N_FFT) -> jax.Array:
    """Time-averaged log-mel energy profile [N_MELS] of a stereo track."""
    from ame_tpu.analysis.stft import melspectrogram
    mono = jnp.mean(x, axis=1)
    mel = melspectrogram(mono, float(sample_rate), n_fft, N_MELS, n_fft // 2)
    return 10.0 * jnp.log10(jnp.maximum(jnp.mean(mel, axis=1), 1e-10))


def _band_dynamics(x: jax.Array, sample_rate: float) -> jax.Array:
    """Per-band dB-RMS frame standard deviation [3] — the dynamics
    signature the spectral profile cannot see. Bands are the same LR4
    crossovers the multiband compressor uses."""
    from ame_tpu.graph.multiband import quality_band_split
    frame = max(int(DYN_FRAME_S * sample_rate), 1)
    if x.shape[0] < 2 * frame:
        raise ValueError(
            f"band-dynamics loss needs >= {2 * frame} samples "
            f"(2 x {DYN_FRAME_S}s frames) — got {x.shape[0]}; "
            "use dynamics_weight=0 for short clips")
    bands = quality_band_split(x, float(sample_rate))   # 3 x [N, 2]
    outs = []
    for b in bands:
        n = (b.shape[0] // frame) * frame
        sq = jnp.mean(b[:n].reshape(-1, frame, b.shape[1]) ** 2,
                      axis=(1, 2))
        db = 10.0 * jnp.log10(jnp.maximum(sq, 1e-10))
        outs.append(jnp.std(db))
    return jnp.stack(outs)


def _stereo_field(x: jax.Array, sample_rate: float) -> jax.Array:
    """Per-band side/mid energy ratio in dB [3] — the width signature."""
    from ame_tpu.graph.multiband import quality_band_split
    mid = (x[:, :1] + x[:, 1:]) * 0.5
    side = (x[:, :1] - x[:, 1:]) * 0.5
    bm = quality_band_split(mid, float(sample_rate))
    bs = quality_band_split(side, float(sample_rate))
    outs = []
    for m, s in zip(bm, bs):
        em = jnp.mean(m * m) + 1e-10
        es = jnp.mean(s * s) + 1e-10
        outs.append(10.0 * jnp.log10(es / em))
    return jnp.stack(outs)


def _chain(x, theta, sample_rate):
    """Differentiable sub-chain: analog character + quality EQ + width,
    plus quality multiband compression when theta carries band params.
    theta: dict of unconstrained parameters."""
    analog = 50.0 * jax.nn.sigmoid(theta["analog_raw"])      # [0, 50] %
    width = 2.0 * jax.nn.sigmoid(theta["width_raw"])         # [0, 2]
    gains = 6.0 * jnp.tanh(theta["eq_raw"])                  # [-6, 6] dB
    y = saturate.analog_character_quality(x, sample_rate, analog)
    y = eq.apply_eq_quality(y, sample_rate, gains[0], -gains[1], gains[2],
                            gains[3])
    y = stereo.stereo_width_quality(y, width)
    if "mb_thresh_raw" in theta:
        from ame_tpu.graph.multiband import multiband_quality
        threshs = -40.0 * jax.nn.sigmoid(theta["mb_thresh_raw"])  # [-40, 0]
        ratios = 1.0 + 9.0 * jax.nn.sigmoid(theta["mb_ratio_raw"])  # [1, 10]
        y = multiband_quality(y, sample_rate, threshs, ratios)
    return y


def _theta_to_settings(theta) -> dict:
    analog = float(50.0 * jax.nn.sigmoid(theta["analog_raw"]))
    width = float(2.0 * jax.nn.sigmoid(theta["width_raw"]))
    gains = np.asarray(6.0 * jnp.tanh(theta["eq_raw"]))
    out = {
        "analog_character": analog,
        "bass_boost": float(gains[0]),
        "mid_cut": float(-gains[1]),
        "presence_boost": float(gains[2]),
        "treble_boost": float(gains[3]),
        "width": width,
    }
    if "mb_thresh_raw" in theta:
        threshs = np.asarray(-40.0 * jax.nn.sigmoid(theta["mb_thresh_raw"]))
        ratios = np.asarray(1.0 + 9.0 * jax.nn.sigmoid(theta["mb_ratio_raw"]))
        out.update({
            "multiband": True,
            "low_thresh": float(threshs[0]), "low_ratio": float(ratios[0]),
            "mid_thresh": float(threshs[1]), "mid_ratio": float(ratios[1]),
            "high_thresh": float(threshs[2]), "high_ratio": float(ratios[2]),
        })
    return out


def _perceptual_targets(target_track, sample_rate, resolutions, dyn_w,
                        stereo_w):
    """Precompute target statistics once: log-mel profile per FFT
    resolution + the band-dynamics and stereo-field signatures."""
    t = jnp.asarray(target_track, jnp.float32)
    profs = tuple(_logmel_profile(t, sample_rate, n) for n in resolutions)
    dyn = (_band_dynamics(t, sample_rate) if dyn_w > 0.0
           else jnp.zeros(3, jnp.float32))
    field = (_stereo_field(t, sample_rate) if stereo_w > 0.0
             else jnp.zeros(3, jnp.float32))
    return profs, dyn, field


@partial(jax.jit, static_argnums=(3,))
def _loss_fn(theta, x, target_profile, sample_rate):
    y = _chain(x, theta, sample_rate)
    prof = _logmel_profile(y, sample_rate)
    return jnp.mean((prof - target_profile) ** 2)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10))
def _perceptual_loss(theta, x, target_profs, target_dyn, target_field,
                     sample_rate, resolutions, dyn_w, stereo_w, tp_w,
                     tp_target):
    y = _chain(x, theta, sample_rate)
    loss = jnp.float32(0.0)
    for prof_t, n_fft in zip(target_profs, resolutions):
        prof = _logmel_profile(y, sample_rate, n_fft)
        loss = loss + jnp.mean((prof - prof_t) ** 2) / len(resolutions)
    if dyn_w > 0.0:
        dyn = _band_dynamics(y, sample_rate)
        loss = loss + dyn_w * jnp.mean((dyn - target_dyn) ** 2)
    if stereo_w > 0.0:
        field = _stereo_field(y, sample_rate)
        loss = loss + stereo_w * jnp.mean((field - target_field) ** 2)
    if tp_w > 0.0:
        from ame_tpu.ops.loudness import true_peak_db
        over = jax.nn.relu(true_peak_db(y) - tp_target)
        loss = loss + tp_w * over * over
    return loss


def fit_settings(x: jax.Array, sample_rate: float,
                 target: jax.Array | np.ndarray,
                 target_is_profile: bool = False,
                 steps: int = 200, lr: float = 0.05,
                 optimize_multiband: bool = False,
                 multi_resolution: bool = False,
                 dynamics_weight: float | None = None,
                 stereo_weight: float = 0.0,
                 true_peak_weight: float = 0.0,
                 tp_target: float = -1.0,
                 verbose: bool = False) -> dict:
    """Fit EQ/width/character so ``x`` spectrally matches ``target``.

    Args:
      x: [N, 2] source track.
      target: [M, 2] reference track, or a precomputed [N_MELS] log-mel
        profile when ``target_is_profile``.
      steps / lr: Adam schedule.
      optimize_multiband: also fit the 6 multiband compressor parameters
        (threshold/ratio per band) through the differentiable quality
        compressor; implies a band-dynamics loss term (the spectral
        profile alone cannot identify compression).
      multi_resolution: spectral loss over MULTI_RES_FFTS windows instead
        of the single default resolution.
      dynamics_weight: weight of the band-dynamics term (default 1.0 when
        optimize_multiband else 0.0). Requires target to be a track.
      stereo_weight: weight of the per-band side/mid stereo-field term
        (gives the width parameter its gradient signal).
      true_peak_weight / tp_target: hinge penalty on the output's true
        peak above ``tp_target`` dBTP (keeps fits master-legal).

    Returns a reference-schema settings dict (multiband keys included when
    optimized; add lufs yourself).
    """
    x = jnp.asarray(x, jnp.float32)
    if dynamics_weight is None:
        dynamics_weight = 1.0 if optimize_multiband else 0.0
    perceptual = (optimize_multiband or multi_resolution
                  or dynamics_weight > 0 or stereo_weight > 0
                  or true_peak_weight > 0)
    if perceptual and target_is_profile:
        raise ValueError("perceptual objectives need a target track, "
                         "not a precomputed profile")

    theta = {
        "analog_raw": jnp.float32(-4.0),   # sigmoid(-4) ~ 0: start clean
        "width_raw": jnp.float32(0.0),     # width 1.0
        "eq_raw": jnp.zeros(4, jnp.float32),
    }
    if optimize_multiband:
        # threshold init at -20 dB (sigmoid(0) * -40): the detector must
        # actually cross threshold or max(level - th, 0) is identically
        # zero and the fit starts in a dead-gradient zone; ratio ~2.1
        theta["mb_thresh_raw"] = jnp.zeros(3, jnp.float32)
        theta["mb_ratio_raw"] = jnp.full(3, -2.0, jnp.float32)

    if perceptual:
        resolutions = MULTI_RES_FFTS if multi_resolution else (N_FFT,)
        target_profs, target_dyn, target_field = _perceptual_targets(
            target, float(sample_rate), resolutions, dynamics_weight,
            stereo_weight)
        loss_args = (x, target_profs, target_dyn, target_field,
                     float(sample_rate), resolutions,
                     float(dynamics_weight), float(stereo_weight),
                     float(true_peak_weight), float(tp_target))
        loss_fn = _perceptual_loss
        grad_fn = jax.jit(jax.grad(_perceptual_loss),
                          static_argnums=(5, 6, 7, 8, 9, 10))
    else:
        if target_is_profile:
            target_profile = jnp.asarray(target, jnp.float32)
        else:
            target_profile = _logmel_profile(
                jnp.asarray(target, jnp.float32), sample_rate)
        loss_args = (x, target_profile, float(sample_rate))
        loss_fn = _loss_fn
        grad_fn = jax.jit(jax.grad(_loss_fn), static_argnums=(3,))

    opt = optax.adam(lr)
    opt_state = opt.init(theta)
    for i in range(steps):
        g = grad_fn(theta, *loss_args)
        updates, opt_state = opt.update(g, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        if verbose and i % 20 == 0:
            print(f"automaster step {i}: loss "
                  f"{float(loss_fn(theta, *loss_args)):.4f}")

    out = _theta_to_settings(theta)
    out["loss"] = float(loss_fn(theta, *loss_args))
    return out
