"""Infra tier (the reference's L0: mytimer.cpp, YAML_Doc/YAML_Element)."""

from hpccg_tpu.utils.report import Report
from hpccg_tpu.utils.timing import fence, time_fn

__all__ = ["Report", "fence", "time_fn"]
