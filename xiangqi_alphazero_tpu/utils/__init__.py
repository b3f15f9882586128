from .profiling import phase_profile, Timer  # noqa: F401
