"""Session building, checkpoint/resume, and partitioning plans."""

from gopie_spark.plans.session import get_spark

__all__ = ["get_spark"]
