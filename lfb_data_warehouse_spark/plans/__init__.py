from .queries import REGISTRY, QuerySpec  # noqa: F401
from . import datapipe_queries  # noqa: F401  (registers datapipe queries)
from . import streaming_queries  # noqa: F401  (registers streaming queries)
from . import io_queries  # noqa: F401  (registers IO round-trip queries)
from . import tpch_extra  # noqa: F401  (registers TPC-H remainder battery)
