from . import headless  # noqa: F401
