from .exact import avg_exact, sum_exact  # noqa: F401
from .keys import hash_key, hash_key_nullable, sentinel_row  # noqa: F401
from .bucketing import NullPolicy, bucketize  # noqa: F401
