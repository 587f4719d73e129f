"""Retrain the mood CNN (the reference's trained weights are absent from its
snapshot — .MISSING_LARGE_BLOBS — so retraining is the only path to a real
mood model; SURVEY.md §7.4 item 7).

Data layout: a directory of audio files arranged as
    <root>/<class-name>/<track>.{wav,mp3,flac,aiff}
with class names from mood_cnn.MOOD_CLASSES ('/' replaced by '-', e.g.
"Angry-Anxious"). Each file is converted to the same 128x128x3 normalized
mel-spectrogram image the inference path uses, with light augmentation
(random 30 s offset + gain jitter).

Usage:
    python -m ame_tpu.models.train_mood <data_root> [--epochs N] [--lr LR]
                                        [--out weights.msgpack]

Runs data-parallel over all local devices via parallel.train.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger("ame_tpu.train")


def _class_dirs(root: str) -> dict[int, str]:
    from ame_tpu.models.mood_cnn import MOOD_CLASSES
    out = {}
    for i, cls in enumerate(MOOD_CLASSES):
        d = os.path.join(root, cls.replace("/", "-"))
        if os.path.isdir(d):
            out[i] = d
    if not out:
        raise SystemExit(f"no class directories found under {root} "
                         f"(expected e.g. {MOOD_CLASSES[0].replace('/','-')})")
    return out


def _augment(seg: np.ndarray, sr: int, rng: np.random.Generator,
             strength: float = 1.0) -> np.ndarray:
    """Texture-destroying augmentations (round-3): the OOF evaluation
    showed the round-2 model keyed on generator texture, so training views
    randomize everything that is NOT a mood cue — gain, vari-speed
    (pitch+tempo together, within class tempo-range slack), spectral tilt,
    background noise color/level, and soft drive."""
    seg = seg * rng.uniform(0.5, 1.3)
    # vari-speed +-8%: resample by index interpolation
    r = rng.uniform(1.0 - 0.08 * strength, 1.0 + 0.08 * strength)
    if abs(r - 1.0) > 1e-3:
        idx = np.arange(int(len(seg) / r)) * r
        seg = np.interp(idx, np.arange(len(seg)), seg).astype(np.float32)
    # spectral tilt +-: dark or bright by up to ~6 dB/octave-ish
    s = rng.uniform(-1.2, 1.2) * strength
    if abs(s) > 0.05:
        spec = np.fft.rfft(seg)
        f = np.fft.rfftfreq(len(seg), 1.0 / sr)
        g = (1.0 + f / rng.uniform(500.0, 3000.0)) ** (-s)
        seg = np.fft.irfft(spec * np.clip(g, 0.1, 4.0),
                           len(seg)).astype(np.float32)
    # background noise: white or pink-ish, -50..-28 dB
    amp = 10.0 ** (rng.uniform(-50, -28) / 20.0)
    w = rng.normal(0, 1, len(seg))
    if rng.uniform() < 0.5:
        w = np.cumsum(w)
        w -= np.linspace(w[0], w[-1], len(w))
        w /= max(np.abs(w).max(), 1e-9) * 0.3
    seg = seg + (amp * w).astype(np.float32)
    # soft drive
    d = rng.uniform(1.0, 1.0 + 1.5 * strength)
    return (np.tanh(seg * d) / d).astype(np.float32)


def _load_examples(root: str, rng: np.random.Generator,
                   per_track: int = 3, augment: float = 1.0):
    """Yield (image [128,128,3], label) pairs."""
    import jax.numpy as jnp
    from ame_tpu.analysis import musicologist as M
    from ame_tpu.io import read_audio
    from ame_tpu.ops.resample import resample

    for label, d in _class_dirs(root).items():
        for name in sorted(os.listdir(d)):
            path = os.path.join(d, name)
            try:
                audio, sr = read_audio(path)
            except Exception as e:
                log.warning("skip %s: %s", path, e)
                continue
            mono = np.mean(audio, axis=1).astype(np.float32)
            y = jnp.asarray(mono)
            if sr != M.ANALYSIS_SR:
                y = resample(y, sr, M.ANALYSIS_SR)
            y = np.asarray(y)
            win = int(M.ANALYSIS_SECONDS * M.ANALYSIS_SR)
            for _ in range(per_track):
                if len(y) > win:
                    off = int(rng.integers(0, len(y) - win))
                    seg = y[off:off + win]
                else:
                    seg = y
                if augment > 0:
                    seg = _augment(seg, M.ANALYSIS_SR, rng, augment)
                img = np.asarray(M.spectrogram_image(jnp.asarray(seg)))
                yield img, label


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save params+optimizer state every epoch and "
                         "RESUME from the newest checkpoint on restart "
                         "(orbax; models/checkpoint.py)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ame_tpu.models import mood_cnn
    from ame_tpu.parallel.mesh import make_mesh
    from ame_tpu.parallel.train import make_sharded_train_step

    rng = np.random.default_rng(0)
    examples = list(_load_examples(args.data_root, rng))
    if not examples:
        raise SystemExit("no training examples found")
    images = np.stack([e[0] for e in examples])
    labels = np.array([e[1] for e in examples], np.int32)
    log.info("loaded %d examples", len(examples))

    ndev = len(jax.devices())
    mesh = make_mesh({"data": ndev, "model": 1})
    with mesh:
        init_fn, step_fn, place_batch = make_sharded_train_step(
            mesh, learning_rate=args.lr)
        params, opt_state = init_fn(0)
        start_epoch = 0
        if args.checkpoint_dir:
            from ame_tpu.models.checkpoint import restore_train_state
            params, opt_state, start_epoch = restore_train_state(
                args.checkpoint_dir, params, opt_state)
            if start_epoch:
                log.info("resumed from checkpoint at epoch %d",
                         start_epoch - 1)
        key = jax.random.PRNGKey(0)
        bsz = max(args.batch // ndev * ndev, ndev)
        for epoch in range(start_epoch, args.epochs):
            perm = rng.permutation(len(examples))
            losses, accs = [], []
            for i in range(0, len(perm) - bsz + 1, bsz):
                idx = perm[i:i + bsz]
                b, l = place_batch(jnp.asarray(images[idx]),
                                   jnp.asarray(labels[idx]))
                key = jax.random.fold_in(key, epoch * 10000 + i)
                params, opt_state, loss, acc = step_fn(
                    params, opt_state, b, l, key)
                losses.append(float(loss))
                accs.append(float(acc))
            log.info("epoch %d: loss %.4f acc %.3f", epoch,
                     np.mean(losses), np.mean(accs))
            if args.checkpoint_dir:
                from ame_tpu.models.checkpoint import save_train_state
                save_train_state(args.checkpoint_dir, epoch, params,
                                 opt_state)
        path = mood_cnn.save_params(
            jax.device_get(params), args.out)
        log.info("saved weights to %s", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
