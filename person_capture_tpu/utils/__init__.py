"""Runtime utilities: throttled logging, step timing, profiler traces."""

from .logging import StatusLogger  # noqa: F401
from .timing import StepTimer, profile_trace  # noqa: F401
