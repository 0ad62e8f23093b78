from cses2humio_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    assert_pushed_filters,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_partial_aggregation,
    assert_pruned_schema,
    assert_take_ordered,
)
