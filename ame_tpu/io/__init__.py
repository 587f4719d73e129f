"""Codec edge: decode/encode at the host boundary (SURVEY.md §7.2 layer 1).

Replaces the reference's ffmpeg subprocess decode/segment/export
(audio_mastering_engine.py:178-179, 199, 223 — N1/N2/N5). No chunking:
tracks decode straight into one [N, C] float32 buffer bound for HBM.
"""

from ame_tpu.io.audio_file import (force_stereo, read_audio,  # noqa: F401
                                   write_audio)
