from cses2humio_spark.streaming.pipeline import (  # noqa: F401
    ENVELOPE_SCHEMA,
    parse_events,
    enrich_events,
    with_replay_dedup,
    run_pipeline,
)
from cses2humio_spark.streaming.sinks import HttpBulkSink, chunked_sink  # noqa: F401
