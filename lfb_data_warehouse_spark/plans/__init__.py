from .queries import REGISTRY, QuerySpec  # noqa: F401
from . import datapipe_queries  # noqa: F401  (registers datapipe queries)
