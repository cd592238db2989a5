from . import gold, silver  # noqa: F401
