from ubresnet_tpu.utils.profiling import StageTimer, trace  # noqa: F401
