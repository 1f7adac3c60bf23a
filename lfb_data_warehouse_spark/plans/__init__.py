from .queries import REGISTRY, QuerySpec  # noqa: F401
from . import datapipe_queries  # noqa: F401  (registers datapipe queries)
from . import streaming_queries  # noqa: F401  (registers streaming queries)
from . import io_queries  # noqa: F401  (registers IO round-trip queries)
from . import tpch_extra  # noqa: F401  (registers TPC-H remainder battery)
from . import curation_queries  # noqa: F401  (registers curation battery)
from . import analytics_queries  # noqa: F401  (registers extended analytics battery)
from . import rotation

# The driver oracle-checks the first 50 registry entries per round;
# rotation.reorder puts the queries that most need a green CORRECTNESS
# row in front (see rotation.py for the per-round policy).
_ordered = rotation.reorder(REGISTRY)
REGISTRY.clear()
REGISTRY.update(_ordered)
