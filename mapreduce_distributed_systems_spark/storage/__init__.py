from mapreduce_distributed_systems_spark.storage.snapshots import (  # noqa: F401
    read_snapshot,
    write_snapshot,
)
from mapreduce_distributed_systems_spark.storage.vector_index import (  # noqa: F401
    build_and_commit_ivf,
    read_ivf_index,
    write_ivf_index,
)
