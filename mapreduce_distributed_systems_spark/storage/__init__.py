from mapreduce_distributed_systems_spark.storage.snapshots import (  # noqa: F401
    read_snapshot,
    write_snapshot,
)
