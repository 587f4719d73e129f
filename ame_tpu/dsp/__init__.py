from ame_tpu.dsp import design  # noqa: F401
