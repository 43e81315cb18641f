from .names import sanitize_name  # noqa: F401
