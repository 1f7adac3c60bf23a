from .queries import REGISTRY, QuerySpec  # noqa: F401
