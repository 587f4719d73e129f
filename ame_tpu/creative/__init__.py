"""Art Director: prompt synthesis + pluggable cover-art providers
(reference C15/C16, audio_mastering_engine.py:40-91, 151-170)."""
