"""Public API — the reference-compatible entry points.

``process_audio(settings, status_cb, progress_cb, art_cb, tag_cb)`` preserves
the reference's only public orchestration symbol (audio_mastering_engine.py:
94-137) including its observability contract (SURVEY.md §5.5):

  * status strings carry the parsed severity prefixes ``Success:`` /
    ``Error:`` / ``Failed:`` (quirk Q13 — the GUI keys off these),
  * progress is reported as (step, total) with total = num_chunks + 4,
    where num_chunks = ceil(duration / 30 s) — the reference's step count
    (engine:184) kept as the progress *unit* even though nothing is
    actually chunked on TPU,
  * art / MP3 / analysis are best-effort sidecars; only the master path is
    fatal (§5.3 error policy).

``master_file`` is the typed, direct entry point for programmatic use.
"""

from __future__ import annotations

import logging
import math
import os
import threading
import traceback
from typing import Any, Callable, Mapping

import numpy as np

from ame_tpu.config import MasterSettings, COMPAT_CHUNK_SECONDS

log = logging.getLogger("ame_tpu")


def _noop(*a, **k):
    pass


def _bucket_length(n: int) -> int:
    """Next length on the {2^k, 1.5*2^k} grid (<= 33% padding): bounds the
    number of distinct compiled programs to ~2 per octave of duration."""
    if n <= 4096:
        return 4096
    p = 1 << ((n - 1).bit_length() - 1)  # largest power of two < n (or == n)
    if n <= p:
        return p
    if n <= p + (p >> 1):
        return p + (p >> 1)
    return p << 1


def master_file(input_file: str, output_file: str,
                settings: MasterSettings | Mapping[str, Any] | None = None,
                status_callback: Callable[[str], None] = _noop,
                progress_callback: Callable[[int, int], None] = _noop,
                shard_time: bool = False) -> dict:
    """Master one file: decode -> device graph -> encode.

    ``shard_time``: distribute THIS track's time axis over every local
    device (sequence-parallel chain, parallel/sp_master.py) — for tracks
    too long or too latency-critical for one chip. Requires the settings
    to be sp-eligible (quality mode, or compat with whole-chunk shards).

    Returns an info dict: sample_rate, n_samples, loudness stats (when
    normalization ran), output path.
    """
    from ame_tpu.io import read_audio

    status_callback("Loading audio into device memory...")
    # PCM16 sources stage as raw int16 (half the upload bytes on the
    # dominant host->device transfer); master_array converts on device
    audio, sr = read_audio(input_file, prefer_int16=True)
    return master_array(audio, sr, output_file, settings,
                        status_callback, progress_callback,
                        shard_time=shard_time)


def master_array(audio: np.ndarray, sr: int, output_file: str,
                 settings: MasterSettings | Mapping[str, Any] | None = None,
                 status_callback: Callable[[str], None] = _noop,
                 progress_callback: Callable[[int, int], None] = _noop,
                 shard_time: bool = False) -> dict:
    """Master already-decoded audio [N, C] float32 — or raw int16
    (PCM16 staging fast path: converted on device, bit-identical to the
    float conversion at half the upload). The fleet runner's entry —
    its native loader prefetch-decodes upcoming tracks while the device
    masters this one."""
    import jax.numpy as jnp
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.io import force_stereo, write_audio
    from ame_tpu.ops import quantize

    if settings is None:
        settings = MasterSettings()
    elif isinstance(settings, Mapping):
        settings = MasterSettings.from_dict(settings)

    from ame_tpu.utils.telemetry import log_memory_usage

    log_memory_usage("Pipeline Start")
    log_memory_usage("After Decode")

    # engine:190-191 conditioning: force stereo; compat mode also forces the
    # int16 grid (set_sample_width(2) semantics).
    audio = force_stereo(audio)
    n = audio.shape[0]
    num_chunks = max(int(math.ceil(n / (COMPAT_CHUNK_SECONDS * sr))), 1)
    total_steps = num_chunks + 4
    # the reference's progress unit is (step, num_chunks + 4) from the very
    # first emission (engine:184-187) — never emit a different denominator,
    # or a GUI keyed to the contract sees the unit change mid-job
    progress_callback(0, total_steps)

    # Shape bucketing: pad to the next {2^k, 1.5*2^k} length so tracks of
    # similar duration share one compiled program (every stage is causal and
    # the loudness gate discards silent blocks, so trailing zeros are
    # semantically free; output is trimmed back to n).
    n_padded = _bucket_length(n)
    if n_padded != n:
        audio = np.concatenate(
            [audio, np.zeros((n_padded - n, audio.shape[1]), audio.dtype)])

    if audio.dtype == np.int16:
        # int16 staging: upload raw samples, convert on device. k/32768
        # is an exact power-of-2 scale, so this is bit-identical to the
        # host float conversion (io/wav._decode_pcm) at half the bytes.
        x = jnp.asarray(audio).astype(jnp.float32) * jnp.float32(
            1.0 / 32768.0)
    else:
        x = jnp.asarray(audio, jnp.float32)
    if settings.mode == "compat":
        x = quantize.int16_roundtrip(x)

    if shard_time:
        try:
            y, info = _master_shard_time(x[:n], sr, settings,
                                         status_callback)
        except SpConfigError:
            raise          # operator misconfiguration must fail loudly
        except Exception as e:
            # sp eligibility (track length, chunk alignment, mode) is
            # stricter than the single-chip graph, and the sp compile
            # path exercises compiler territory the single-chip graph
            # doesn't; either way the job must still master — degrade,
            # don't fail (the framework's layered best-effort policy).
            log.exception("shard_time master failed; degrading")
            status_callback(f"Warning: time-sharding unavailable ({e}); "
                            f"falling back to one device.")
            shard_time = False
        else:
            progress_callback(1, total_steps)
    if not shard_time:
        status_callback("Running mastering graph on device...")
        progress_callback(1, total_steps)
        y, info = master_graph(x, sr, settings, n_valid=jnp.int32(n))
        y.block_until_ready()
        y = y[:n]
    progress_callback(num_chunks + 3, total_steps)
    log_memory_usage("After Graph")

    status_callback("Exporting master...")
    ext = os.path.splitext(output_file)[1].lower()
    if settings.bits == 16 and ext in (".wav", ".wave", ".aif", ".aiff"):
        # Quantize ON DEVICE and fetch int16: the e2e breakdown measured
        # the float32 output fetch as the product-level bottleneck
        # (5.8 s vs a 33 ms device chain on the tunneled link) — int16
        # halves the dominant transfer, and the formula is the exact
        # trunc(clip·32767) the writers apply (ops/quantize.py).
        pcm = quantize.float_to_int16(y).astype(jnp.int16)
        write_audio(output_file, np.asarray(pcm), sr, bits=16)
    else:
        write_audio(output_file, np.asarray(y), sr, bits=settings.bits)
    progress_callback(total_steps, total_steps)
    log_memory_usage("After Export")

    out = {"output_file": output_file, "sample_rate": sr, "n_samples": n}
    out.update({k: float(v) for k, v in info.items()})
    return out


class SpConfigError(Exception):
    """Operator misconfiguration of the sp pool — never swallowed by the
    shard_time degrade path (unlike sp-eligibility and compile failures;
    note XlaRuntimeError subclasses RuntimeError, so a plain RuntimeError
    re-raise would defeat the degrade policy)."""


_shard_time_lock = threading.Lock()


def _master_shard_time(x, sr, settings, status_callback):
    """One track over every device in the sp pool (the padded sp chain).

    AME_TPU_SP_DEVICES caps the pool (0/unset = all local devices) so an
    operator can reserve chips for per-device serve workers. A process
    lock serializes shard_time masters — two all-device jobs would only
    contend for the same chips."""
    import jax
    from ame_tpu.parallel.mesh import make_mesh
    from ame_tpu.parallel.sp_master import master_sequence_parallel_padded

    devs = list(jax.local_devices())
    cap_env = os.environ.get("AME_TPU_SP_DEVICES", "0")
    try:
        cap = int(cap_env)
    except ValueError:
        raise SpConfigError(
            f"AME_TPU_SP_DEVICES must be an integer device count, got "
            f"{cap_env!r}") from None
    if cap > 0:
        devs = devs[:cap]
    status_callback(f"Running time-sharded mastering graph over "
                    f"{len(devs)} devices...")
    with _shard_time_lock:
        # the sp wrapper pads to its own shard/hop/chunk granule and masks
        # the measurement with the true length (the caller already dropped
        # the bucket padding)
        y, info = master_sequence_parallel_padded(
            x, sr, settings, make_mesh({"sp": len(devs)}, devices=devs))
        y.block_until_ready()
    return y, info


def export_mp3_sidecar(wav_path: str,
                       status_callback: Callable[[str], None]) -> None:
    """Best-effort MP3 export beside the WAV (engine:140-150 contract:
    failures are warnings, never fatal)."""
    if not wav_path or not os.path.exists(wav_path):
        log.warning("master WAV missing; skipping MP3")
        status_callback("Warning: Could not find master WAV to create MP3.")
        return
    mp3_path = os.path.splitext(wav_path)[0] + ".mp3"
    status_callback("Creating high-quality MP3...")
    try:
        from ame_tpu.io import read_audio
        from ame_tpu.io.codecs import encode_mp3
        audio, sr = read_audio(wav_path)
        encode_mp3(mp3_path, audio, sr, vbr_quality=0)
        status_callback("High-quality MP3 created successfully.")
    except Exception:
        log.exception("MP3 export failed")
        status_callback("Error: Failed to create MP3 file.")


def process_audio(settings: Mapping[str, Any],
                  status_callback: Callable[[str], None],
                  progress_callback: Callable[[int, int], None],
                  art_callback: Callable[[str | None], None],
                  tag_callback: Callable[[str], None]) -> None:
    """Reference-parity orchestrator: master -> MP3 -> analysis -> prompt ->
    art, with the layered degrade-and-continue error policy."""
    try:
        input_file = settings.get("input_file")
        output_file = settings.get("output_file")
        if not input_file or not output_file:
            raise ValueError("Input or output file not specified.")

        info = master_file(input_file, output_file, settings,
                           status_callback, progress_callback,
                           shard_time=bool(settings.get("shard_time",
                                                        False)))

        if settings.get("create_mp3", False):
            export_mp3_sidecar(info["output_file"], status_callback)

        status_callback("Mastering complete. Preparing for AI analysis...")
        auto_generate = settings.get("auto_generate_prompt", False)
        manual_prompt = (settings.get("art_prompt") or "").strip()
        final_art_prompt = None

        if auto_generate:
            status_callback("Analyzing audio with the Musicologist...")
            from ame_tpu.analysis import musicologist
            tech_brief = musicologist.analyze_song(input_file)
            if "error" in tech_brief:
                status_callback(
                    f"Failed: Could not analyze audio. {tech_brief['error']}")
                tag_callback(f"Analysis Error: {tech_brief['error']}")
            else:
                tag_callback(
                    f"Mood: {tech_brief['mood']} | Tempo: {tech_brief['tempo']}"
                    f" | Brightness: {tech_brief['brightness']}"
                    f" | Density: {tech_brief['density']}")
                status_callback("Building creative prompt from analysis...")
                from ame_tpu.creative.prompts import generate_creative_prompt
                final_art_prompt = generate_creative_prompt(tech_brief)
        elif manual_prompt:
            final_art_prompt = manual_prompt
            tag_callback("Using manual prompt.")

        from ame_tpu.creative import art as art_mod
        if final_art_prompt and art_mod.available():
            status_callback("Starting AI art generation...")
            try:
                art_path = art_mod.generate_cover_art(
                    final_art_prompt, output_file)
                status_callback("Success: AI art generation complete!")
                art_callback(art_path)
            except Exception:
                log.exception("art generation failed")
                status_callback("Failed: Mastering complete, but AI art failed.")
                art_callback(None)
        else:
            status_callback("Success: Processing complete! (No art generated)")
            art_callback(None)
    except Exception as e:
        log.error("fatal error in process_audio:\n%s", traceback.format_exc())
        status_callback(f"Error: {e}")
        progress_callback(0, 1)
        art_callback(None)
        tag_callback("Processing failed.")
