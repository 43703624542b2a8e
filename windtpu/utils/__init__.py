from windtpu.utils.logging import MetricsLogger, profile_region  # noqa: F401
