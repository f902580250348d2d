from .trace import StageTimer, profile_trace, memory_snapshot, log_memory

__all__ = ["StageTimer", "profile_trace", "memory_snapshot", "log_memory"]
