from cses2humio_spark.operators.joins import asof_join, range_join  # noqa: F401
from cses2humio_spark.operators.aggregates import timechart, top_k  # noqa: F401
from cses2humio_spark.operators.windows import top_k_per_group  # noqa: F401
from cses2humio_spark.operators.dedup import dedup_exact_by_key  # noqa: F401
