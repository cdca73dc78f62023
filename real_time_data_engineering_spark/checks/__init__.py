from .oracle import OracleDiffer, compare_frames  # noqa: F401
