"""STFT / mel-spectrogram pipeline (replaces librosa's feature stack, N9).

Semantics follow librosa's defaults as used by the reference tagger
(ai_tagger.py:49-54): n_fft 2048, hop 512, hann window, centered frames
(zero padding), power mel spectrogram with a 128-band slaney filterbank,
power_to_db with ref=max and an 80 dB floor. Implementations are
independent; parity targets are behavioral (the Musicologist's buckets),
not bitwise.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def hann_window(n: int) -> np.ndarray:
    # periodic Hann (librosa/scipy sym=False convention for STFT)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def frame_signal(y: jax.Array, frame_length: int, hop: int,
                 center: bool = True) -> jax.Array:
    """[N] -> [n_frames, frame_length], zero-padded centered frames.

    When ``frame_length`` is a multiple of ``hop`` (librosa's 2048/512
    default), frames are assembled from hop-sized tiles by slicing — the
    [n_frames, frame_length] index gather this replaces dominated the
    Musicologist's device time on TPU (gathers don't tile; slices are
    free layout ops)."""
    if center:
        y = jnp.pad(y, (frame_length // 2, frame_length // 2))
    n_frames = 1 + (y.shape[0] - frame_length) // hop
    if frame_length % hop == 0:
        r = frame_length // hop
        n_tiles = n_frames + r - 1
        pad = max(n_tiles * hop - y.shape[0], 0)
        tiles = jnp.pad(y, (0, pad))[: n_tiles * hop].reshape(n_tiles, hop)
        return jnp.concatenate([tiles[t0:t0 + n_frames] for t0 in range(r)],
                               axis=1)
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame_length)[None, :])
    return y[idx]


@partial(jax.jit, static_argnums=(1, 2))
def stft_mag(y: jax.Array, n_fft: int = 2048, hop: int = 512) -> jax.Array:
    """Magnitude STFT: [N] -> [n_fft//2+1, n_frames] (librosa layout)."""
    frames = frame_signal(y, n_fft, hop)
    win = jnp.asarray(hann_window(n_fft), y.dtype)
    spec = jnp.fft.rfft(frames * win, axis=1)
    return jnp.abs(spec).T


# ---------------------------------------------------------------------------
# Slaney mel filterbank
# ---------------------------------------------------------------------------

def _hz_to_mel(f):
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10)
                                               / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    f = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def mel_filterbank(sr: float, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """[n_mels, n_fft//2+1] slaney-normalized triangular filters."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb[i] = np.maximum(0, np.minimum(lower, upper))
    # slaney norm: equal-area triangles
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def melspectrogram(y: jax.Array, sr: float, n_fft: int = 2048,
                   n_mels: int = 128, hop: int = 512) -> jax.Array:
    """Power mel spectrogram [n_mels, n_frames] (one matmul onto the MXU)."""
    mag = stft_mag(y, n_fft, hop)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels), y.dtype)
    return jnp.matmul(fb, mag * mag, precision=jax.lax.Precision.HIGHEST)


def power_to_db(S: jax.Array, top_db: float = 80.0) -> jax.Array:
    """10*log10(S / max(S)), floored at -top_db (librosa ref=np.max)."""
    ref = jnp.max(S)
    db = 10.0 * jnp.log10(jnp.maximum(S, 1e-10)) \
        - 10.0 * jnp.log10(jnp.maximum(ref, 1e-10))
    return jnp.maximum(db, -top_db)
