from . import gorilla, preprocessors, scalar  # noqa: F401
