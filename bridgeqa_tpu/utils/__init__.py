from bridgeqa_tpu.utils.logging_utils import EpochETA, RunLogger, RunningMeans  # noqa: F401
