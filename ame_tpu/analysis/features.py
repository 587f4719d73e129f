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


KEY_NAMES = ("C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A",
             "A#", "B")

# Krumhansl-Schmuckler tonal-hierarchy profiles (major / minor) — the
# standard probe-tone ratings used for key finding; correlation against
# all 24 rotations picks the key. (Beyond the reference's brief — a
# capability-add like streaming/automaster.)
_KS_MAJOR = np.array([6.35, 2.23, 3.48, 2.33, 4.38, 4.09,
                      2.52, 5.19, 2.39, 3.66, 2.29, 2.88], np.float32)
_KS_MINOR = np.array([6.33, 2.68, 3.52, 5.38, 2.60, 3.53,
                      2.54, 4.75, 3.98, 2.69, 3.34, 3.17], np.float32)


def _key_profiles() -> np.ndarray:
    """[24, 12] z-scored profiles: rows 0-11 major keys C..B, 12-23
    minor. Row k's tonic is KEY_NAMES[k % 12]."""
    rows = [np.roll(_KS_MAJOR, k) for k in range(12)] + \
           [np.roll(_KS_MINOR, k) for k in range(12)]
    P = np.stack(rows)
    P = P - P.mean(axis=1, keepdims=True)
    return (P / np.linalg.norm(P, axis=1, keepdims=True)).astype(np.float32)


def _chroma_fold(sr: float, n_fft: int) -> np.ndarray:
    """[12, bins] pitch-class fold matrix (host-built): each STFT bin in
    55 Hz..5 kHz votes for its nearest equal-tempered pitch class."""
    nbins = n_fft // 2 + 1
    freqs = np.linspace(0.0, sr / 2.0, nbins)
    midi = 69.0 + 12.0 * np.log2(np.maximum(freqs, 1e-9) / 440.0)
    pc = np.round(midi).astype(int) % 12
    valid = (freqs >= 55.0) & (freqs <= 5000.0)
    fold = np.zeros((12, nbins), np.float32)
    fold[pc[valid], np.arange(nbins)[valid]] = 1.0
    return fold


def key_index(mag: jax.Array, sr: float) -> jax.Array:
    """Key estimate from an STFT magnitude [bins, frames]: chroma fold ->
    time-mean pitch-class energy -> correlation with the 24 K-S
    profiles -> argmax index (0-11 major C..B, 12-23 minor)."""
    fold = jnp.asarray(_chroma_fold(sr, 2 * (mag.shape[0] - 1)))
    chroma = jnp.mean(jnp.matmul(fold, mag * mag,
                                 precision=jax.lax.Precision.HIGHEST),
                      axis=1)
    c = chroma - jnp.mean(chroma)
    c = c / jnp.maximum(jnp.linalg.norm(c), 1e-12)
    P = jnp.asarray(_key_profiles())
    return jnp.argmax(P @ c).astype(jnp.float32)


def key_name(idx: int) -> str:
    idx = int(idx)
    return f"{KEY_NAMES[idx % 12]} {'major' if idx < 12 else 'minor'}"


@partial(jax.jit, static_argnums=(1,))
def extract_all(y: jax.Array, sr: float):
    """All technical features in ONE program (one device dispatch):
    returns (tempo_bpm, centroid_mean, rms_mean, key_idx). Shares the
    STFT between the centroid, the key chroma, and the onset envelope's
    mel spectrogram input."""
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
    return tempo, centroid, rms, key_index(mag, sr)


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
