from meteor_scatter_tpu.utils.timing import PhaseTimer, Throughput  # noqa: F401
