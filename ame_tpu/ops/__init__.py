"""Device kernels (JAX/XLA + Pallas) for the mastering graph.

Each module replaces one native backend of the reference (SURVEY.md §2.3):
  scan_iir    — scipy.signal lfilter/sosfilt (N6)
  eq          — shelf/peak blend math (C7/C8/C9)
  stereo      — mid/side width (C6)
  saturate    — tanh analog character (C5)
  quantize    — pydub int16 round-trip compat (C4, quirk Q5)
  compressor  — pydub compress_dynamic_range (N7)
  limiter     — ffmpeg alimiter (N4)
  loudness    — ffmpeg loudnorm / EBU R128 (N3)
  resample    — librosa/soxr resampling (part of N9)
"""
