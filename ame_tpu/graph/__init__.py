"""The mastering signal graph: one jit-compiled function over an
HBM-resident [N, 2] buffer, replacing the reference's chunk->disk->ffmpeg
pipeline (SURVEY.md §7.1)."""
