from .incremental import incremental_new_rows  # noqa: F401
from .temporal import nearest_within  # noqa: F401
from .dims import date_spine, latest_per_group, collapse_per_key  # noqa: F401
from .topk import top_k_per_group  # noqa: F401
