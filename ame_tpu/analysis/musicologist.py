"""The Musicologist: full technical brief for a song (reference C13,
ai_tagger.py:56-103 — rebuilt on-device).

Contract parity:
  * analyzes the ORIGINAL input file, first 30 s, mono at 22 050 Hz
    (quirk Q11; ai_tagger.py:66),
  * mood via 128x128x3 normalized mel-spectrogram image -> CNN -> argmax ->
    label class (ai_tagger.py:47-54, 69-73),
  * tempo / spectral centroid / RMS features with identical bucket
    thresholds (ai_tagger.py:87-89),
  * returns {"mood", "tempo": "<n> BPM (<class>)", "brightness", "density"}
    or {"error": str} — never raises (ai_tagger.py:92-103).
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp

from ame_tpu.analysis import features as F
from ame_tpu.analysis import stft as S
from ame_tpu.models import mood_cnn
from ame_tpu.ops.resample import resample

log = logging.getLogger("ame_tpu.analysis")

_warned_untrained = False


def _warn_untrained_once():
    global _warned_untrained
    if not _warned_untrained:
        _warned_untrained = True
        log.warning("mood CNN running with untrained (seed) weights — "
                    "train via models/train_mood.py or set "
                    "AME_TPU_MOOD_WEIGHTS")

ANALYSIS_SR = 22050
ANALYSIS_SECONDS = 30.0


def load_for_analysis(path: str):
    """Decode -> mono mixdown -> 22 050 Hz -> first 30 s ([N] float32)."""
    from ame_tpu.io import read_audio
    audio, sr = read_audio(path)
    mono = np.mean(audio, axis=1).astype(np.float32)
    y = jnp.asarray(mono)
    if sr != ANALYSIS_SR:
        y = resample(y, sr, ANALYSIS_SR)
    max_n = int(ANALYSIS_SECONDS * ANALYSIS_SR)
    return y[:max_n]


@jax.jit
def spectrogram_image(y: jax.Array) -> jax.Array:
    """Mel power -> dB (ref=max) -> min-max normalize -> 3-channel stack ->
    bilinear resize to 128x128 (ai_tagger.py:47-54 semantics;
    tf.image.resize -> jax.image.resize)."""
    mel = S.melspectrogram(y, float(ANALYSIS_SR), 2048,
                           mood_cnn.IMG_SIZE, 512)
    db = S.power_to_db(mel)
    lo = jnp.min(db)
    hi = jnp.max(db)
    norm = (db - lo) / jnp.maximum(hi - lo, 1e-6)
    img = jnp.stack([norm] * 3, axis=-1)  # [mels, frames, 3]
    return jax.image.resize(
        img, (mood_cnn.IMG_SIZE, mood_cnn.IMG_SIZE, 3), method="bilinear")


@jax.jit
def _analyze_jit(params, y):
    """Whole brief in ONE program and ONE host fetch: [4 logits, tempo,
    centroid, rms, key]. Serial scalar fetches cost ~45 ms each over the
    tunneled TPU — batching them into a single 8-float transfer is worth
    ~120 ms per track."""
    img = spectrogram_image(y)
    logits = mood_cnn.predict_logits(params, img[None])[0]
    t, c, r, k = F.extract_all(y, float(ANALYSIS_SR))
    return jnp.concatenate([logits, jnp.stack([t, c, r, k])])


def analyze_waveform(y: jax.Array) -> dict:
    """Brief from an already-conditioned [N] 22.05 kHz waveform."""
    params, trained = mood_cnn.load_params()
    vec = np.asarray(_analyze_jit(params, y))
    mood = mood_cnn.MOOD_CLASSES[int(np.argmax(vec[:4]))]
    tempo, centroid, rms = float(vec[4]), float(vec[5]), float(vec[6])
    buckets = F.classify(tempo, centroid, rms)

    brief = {
        "mood": mood,
        "tempo": f"{tempo:.0f} BPM ({buckets['tempo_class']})",
        "brightness": buckets["brightness"],
        "density": buckets["density"],
        "key": F.key_name(vec[7]),
    }
    if not trained:
        _warn_untrained_once()
    log.info("technical brief: %s", brief)
    return brief


def analyze_song(audio_file_path: str) -> dict:
    """File-level entry point; error-dict contract of ai_tagger.analyze_song."""
    log.info("analyzing song: %s", audio_file_path)
    try:
        y = load_for_analysis(audio_file_path)
        return analyze_waveform(y)
    except Exception as e:
        log.exception("song analysis failed")
        return {"error": str(e)}


@jax.jit
def _analyze_batch_jit(params, ys):
    """The WHOLE batched brief — B spectrograms, one CNN batch, B feature
    extractions — as ONE program and ONE [B, 8] fetch (round-2 weak #5:
    the per-track feature loop made 'batched' mean B dispatches + 1)."""
    imgs = jax.vmap(spectrogram_image)(ys)
    logits = mood_cnn.predict_logits(params, imgs)          # [B, 4]
    feats = jax.vmap(
        lambda y: jnp.stack(F.extract_all(y, float(ANALYSIS_SR))))(ys)
    return jnp.concatenate([logits, feats], axis=1)          # [B, 8]


def _brief_from_vec(vec: np.ndarray) -> dict:
    mood = mood_cnn.MOOD_CLASSES[int(np.argmax(vec[:4]))]
    tempo, centroid, rms = float(vec[4]), float(vec[5]), float(vec[6])
    b = F.classify(tempo, centroid, rms)
    return {
        "mood": mood,
        "tempo": f"{tempo:.0f} BPM ({b['tempo_class']})",
        "brightness": b["brightness"],
        "density": b["density"],
        "key": F.key_name(vec[7]),
    }


def analyze_batch(paths: list[str]) -> list[dict]:
    """Fleet-mode batched analysis: tracks are grouped by conditioned
    length (almost always one group — the 30 s analysis window) and each
    group runs as a single device dispatch, numerically identical to the
    per-track path."""
    ys = []
    briefs: list[dict | None] = []
    for p in paths:
        try:
            ys.append(load_for_analysis(p))
            briefs.append(None)
        except Exception as e:
            ys.append(None)
            briefs.append({"error": str(e)})
    groups: dict[int, list[int]] = {}
    for i, y in enumerate(ys):
        if y is not None:
            groups.setdefault(y.shape[0], []).append(i)
    if groups:
        params, _ = mood_cnn.load_params()
        for idxs in groups.values():
            batch = jnp.stack([ys[i] for i in idxs])
            vecs = np.asarray(_analyze_batch_jit(params, batch))
            for j, i in enumerate(idxs):
                briefs[i] = _brief_from_vec(vecs[j])
    return briefs  # type: ignore[return-value]
