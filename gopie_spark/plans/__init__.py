"""Session building, checkpoint/resume, partitioning plans, and the
sketch-driven physical-plan advisor."""

from gopie_spark.plans.session import get_spark
from gopie_spark.plans.advisor import (JoinProfile, agg_advice,
                                       build_join_profile, join_advice,
                                       load_join_profile,
                                       persist_join_profile)
from gopie_spark.plans.joiner import advised_join, plan_execution

__all__ = ["get_spark", "JoinProfile", "build_join_profile",
           "join_advice", "agg_advice", "persist_join_profile",
           "load_join_profile", "advised_join", "plan_execution"]
