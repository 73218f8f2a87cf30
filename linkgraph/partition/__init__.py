from linkgraph.partition.strategies import (  # noqa: F401
    dbh,
    grid,
    hash_edges,
    partition_edges,
    round_robin,
)
from linkgraph.partition.metrics import (  # noqa: F401
    edge_partition_metrics,
    vertex_partition_metrics,
)
