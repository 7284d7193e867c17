from mapreduce_distributed_systems_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_specs,
    bench_specs,
    get_spec,
    register,
)
