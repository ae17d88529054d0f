from .rollup_spec import RollupSpec  # noqa: F401
from .job import RollupJob  # noqa: F401
