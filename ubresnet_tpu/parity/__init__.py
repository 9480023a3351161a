from ubresnet_tpu.parity.compare import compare_score_files, score_diff  # noqa: F401
