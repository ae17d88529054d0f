from .rollup_spec import RollupSpec  # noqa: F401
from .job import RollupJob  # noqa: F401
from .to_sql import asof_feature_sql, rollup_sql  # noqa: F401
from .pipeline import FastPropPipeline  # noqa: F401
from .runner import register_compat, run_pipeline_sql, run_sql  # noqa: F401
