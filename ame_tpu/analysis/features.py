"""Technical features: tempo, spectral centroid, RMS + the reference's
bucket thresholds (ai_tagger.py:79-89).

Tempo follows the standard onset-autocorrelation recipe (the algorithm
family behind librosa's beat tracker): log-mel spectral flux onset envelope,
autocorrelation, log-normal prior centered at 120 BPM, argmax. The
classification buckets are identical to the reference:
  tempo:      > 120 fast | > 90 moderate | else slow
  centroid:   > 2000 bright | > 1000 warm | else dark
  rms:        > 0.1 dense | > 0.05 moderate | else sparse
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ame_tpu.analysis import stft as S


@partial(jax.jit, static_argnums=(1, 2))
def onset_envelope(y: jax.Array, sr: float, hop: int = 512) -> jax.Array:
    """Spectral flux on the dB mel spectrogram: mean over bands of the
    half-wave-rectified first time difference."""
    mel = S.melspectrogram(y, sr, 2048, 128, hop)
    db = S.power_to_db(mel)
    flux = jnp.maximum(db[:, 1:] - db[:, :-1], 0.0)
    return jnp.mean(flux, axis=0)


@partial(jax.jit, static_argnums=(1, 2, 3))
def tempo_bpm(y: jax.Array, sr: float, hop: int = 512,
              start_bpm: float = 120.0) -> jax.Array:
    """Global tempo estimate in BPM."""
    env = onset_envelope(y, sr, hop)
    env = env - jnp.mean(env)
    n = env.shape[0]
    # autocorrelation via FFT
    nfft = 2 * n
    E = jnp.fft.rfft(env, nfft)
    ac = jnp.fft.irfft(E * jnp.conj(E), nfft)[:n]
    ac = jnp.maximum(ac, 0.0)

    frames_per_sec = sr / hop
    lags = jnp.arange(n, dtype=jnp.float32)
    bpms = jnp.where(lags > 0, 60.0 * frames_per_sec / jnp.maximum(lags, 1),
                     jnp.inf)
    # log-normal prior around start_bpm (std = 1 octave)
    prior = jnp.exp(-0.5 * ((jnp.log2(jnp.maximum(bpms, 1e-6))
                             - np.log2(start_bpm)) ** 2))
    # restrict to a sane 30..300 BPM band
    valid = (bpms >= 30.0) & (bpms <= 300.0)
    score = jnp.where(valid, ac * prior, -1.0)
    best = jnp.argmax(score)
    return bpms[best]


@partial(jax.jit, static_argnums=(1, 2))
def spectral_centroid_mean(y: jax.Array, sr: float, hop: int = 512):
    """Mean over frames of the magnitude-weighted frequency centroid."""
    mag = S.stft_mag(y, 2048, hop)  # [bins, frames]
    freqs = jnp.linspace(0.0, sr / 2.0, mag.shape[0])[:, None]
    cent = jnp.sum(freqs * mag, axis=0) / jnp.maximum(
        jnp.sum(mag, axis=0), 1e-10)
    return jnp.mean(cent)


@partial(jax.jit, static_argnums=(1, 2))
def rms_mean(y: jax.Array, frame_length: int = 2048, hop: int = 512):
    """Mean over frames of the per-frame RMS (centered frames)."""
    frames = S.frame_signal(y, frame_length, hop)
    return jnp.mean(jnp.sqrt(jnp.mean(frames * frames, axis=1)))


@partial(jax.jit, static_argnums=(1,))
def extract_all(y: jax.Array, sr: float):
    """All technical features in ONE program (one device dispatch):
    returns (tempo_bpm, centroid_mean, rms_mean). Shares the STFT between
    the centroid and the onset envelope's mel spectrogram input."""
    mag = S.stft_mag(y, 2048, 512)  # [bins, frames]

    # centroid
    freqs = jnp.linspace(0.0, sr / 2.0, mag.shape[0])[:, None]
    cent = jnp.sum(freqs * mag, axis=0) / jnp.maximum(
        jnp.sum(mag, axis=0), 1e-10)
    centroid = jnp.mean(cent)

    # rms (frame energy from the same frames as librosa's defaults)
    frames = S.frame_signal(y, 2048, 512)
    rms = jnp.mean(jnp.sqrt(jnp.mean(frames * frames, axis=1)))

    # tempo from the mel flux of the shared magnitude spectrogram
    fb = jnp.asarray(S.mel_filterbank(sr, 2048, 128), y.dtype)
    mel = jnp.matmul(fb, mag * mag, precision=jax.lax.Precision.HIGHEST)
    db = S.power_to_db(mel)
    env = jnp.mean(jnp.maximum(db[:, 1:] - db[:, :-1], 0.0), axis=0)
    env = env - jnp.mean(env)
    n = env.shape[0]
    E = jnp.fft.rfft(env, 2 * n)
    ac = jnp.maximum(jnp.fft.irfft(E * jnp.conj(E), 2 * n)[:n], 0.0)
    fps = sr / 512.0
    lags = jnp.arange(n, dtype=jnp.float32)
    bpms = jnp.where(lags > 0, 60.0 * fps / jnp.maximum(lags, 1), jnp.inf)
    prior = jnp.exp(-0.5 * ((jnp.log2(jnp.maximum(bpms, 1e-6))
                             - np.log2(120.0)) ** 2))
    valid = (bpms >= 30.0) & (bpms <= 300.0)
    tempo = bpms[jnp.argmax(jnp.where(valid, ac * prior, -1.0))]
    return tempo, centroid, rms


def classify(tempo: float, centroid: float, rms: float) -> dict:
    """The reference's exact bucket thresholds (ai_tagger.py:87-89)."""
    tempo_class = ("fast" if tempo > 120 else
                   "moderate" if tempo > 90 else "slow")
    brightness = ("bright" if centroid > 2000 else
                  "warm" if centroid > 1000 else "dark")
    density = ("dense" if rms > 0.1 else
               "moderate" if rms > 0.05 else "sparse")
    return {"tempo_class": tempo_class, "brightness": brightness,
            "density": density}
