from cses2humio_spark.functions.text import (  # noqa: F401
    token_count,
    quality_score,
    language_id,
    fingerprint,
)
from cses2humio_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
