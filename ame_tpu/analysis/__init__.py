"""The Musicologist: on-device audio analysis (reference C13/C14/N8/N9 —
ai_tagger.py rebuilt as batched JAX STFT + mel + Flax CNN + tempo/centroid/
rms features)."""
