from ame_tpu.utils.compile_cache import enable_persistent_cache  # noqa: F401
